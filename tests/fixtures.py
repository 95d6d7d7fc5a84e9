"""Deterministic dirty insurance fixtures per FIXTURES.md §B.

Synthesizes the reference's raw-CSV pathologies (mixed date formats,
mixed currency symbols, packed GPS triples, un-normalized categories,
nulls, negatives, all-null rows) with a seeded RNG so every test run
sees identical data.
"""

from __future__ import annotations

import random

import pandas as pd

SEED = 42

PRODUCTS = ["Auto", "Health", "Home", "Life"]
STATUSES = ["Active", "Cancelled", "Expired", "Renewed", "Suspended"]
RISK_ZONES = ["High", "Medium", "Low"]
CHANNELS = ["Agency", "Broker", "Phone", "Web"]
CSPS = ["Employee", "Manager", "Retired", "Self_employed", "Student", "Unemployed", "Worker"]
GENDERS = ["F", "M", "Female", "Male"]
FIRST = ["Pascal", "Marie", "Luc", "Anne", "Jean", "Claire", "Hugo", "Emma"]
LAST = ["Dubois", "Martin", "Bernard", "Petit", "Robert", "Richard"]
BRANDS = ["BMW", "Mercedes", "Peugeot", "Renault", "Volkswagen"]
FUELS = ["Diesel", "Electric", "Gasoline", "Hybrid"]
USAGES = ["Mixed", "Personal", "Professional"]
COLORS = ["Black", "Blue", "Gray", "Red", "White"]
CLAIM_TYPES = ["Collision", "Fire", "Glass_damage", "Storm", "Theft", "Vandalism", "Water_damage"]
CLAIM_STATUSES = ["Closed", "Expert_review", "In_progress", "Open", "Rejected"]
LIABILITIES = ["Force_majeure", "Insured", "Shared", "Third_party"]


def contracts_csv(path: str, n: int = 200) -> pd.DataFrame:
    rng = random.Random(SEED)
    rows = []
    for i in range(n):
        cid = f"CTR_{i:06d}"
        client = f"CLI_{i % 150:06d}"
        # 1-, 2-, 3-token names to pin first/last-token semantics
        toks = rng.choice([1, 2, 2, 2, 3])
        name = " ".join(
            [rng.choice(FIRST)] * (toks > 0)
            + [rng.choice(FIRST)] * (toks > 2)
            + [rng.choice(LAST)] * (toks > 1)
        )
        y, m, d = 2020 + rng.randrange(4), 1 + rng.randrange(12), 1 + rng.randrange(28)
        start = f"{y:04d}-{m:02d}-{d:02d}" if rng.random() < 0.7 else f"{m:02d}/{d:02d}/{y:04d}"
        end = f"{y + 1:04d}-{m:02d}-{d:02d}"
        amt = round(rng.uniform(200, 3000), 2)
        style = rng.randrange(4)
        if style == 0:
            premium = f"{amt}€"
        elif style == 1:
            premium = f"€{amt}"
        elif style == 2:
            premium = f"${amt}"
        else:
            premium = f"-{amt}€"  # negative → coerced to 0.0
        rows.append(
            {
                "contract_id": cid,
                "client_id": client,
                "client_name": name,
                "product": rng.choice(PRODUCTS),
                "start_date": start,
                "end_date": end,
                "annual_premium": premium,
                "status": rng.choice(STATUSES),
                "city_postal": f"Paris_{75000 + rng.randrange(20)}",
                "risk_zone": rng.choice(RISK_ZONES),
                "client_age": None if rng.random() < 0.08 else float(20 + rng.randrange(60)),
                "channel": rng.choice(CHANNELS),
                "csp": None if rng.random() < 0.12 else rng.choice(CSPS),
                "gender": None if rng.random() < 0.21 else rng.choice(GENDERS),
            }
        )
    df = pd.DataFrame(rows)
    # a couple of fully-empty rows (dropped at ingest, 01:56)
    empty = pd.DataFrame([{c: None for c in df.columns}] * 2)
    pd.concat([df, empty], ignore_index=True).to_csv(path, index=False)
    return df


def vehicles_csv(path: str, n: int = 100) -> pd.DataFrame:
    rng = random.Random(SEED + 1)
    rows = []
    for i in range(n):
        rows.append(
            {
                "contract_id": f"CTR_{rng.randrange(200):06d}",
                "brand": rng.choice(BRANDS),
                "model": f"Model{rng.randrange(9)}",
                "year": None if rng.random() < 0.05 else f"{2010 + rng.randrange(14)}.0",
                "power": None if rng.random() < 0.05 else f"{60 + rng.randrange(240)} HP",
                "fuel_type": rng.choice(FUELS),
                "current_value": None if rng.random() < 0.05 else f"{round(rng.uniform(3000, 60000), 2)}€",
                "color": rng.choice(COLORS),
                "usage": rng.choice(USAGES),
                "previous_claims": None if rng.random() < 0.1 else f"{rng.randrange(5)}.0",
            }
        )
    df = pd.DataFrame(rows)
    df.to_csv(path, index=False)
    return df


def claims_csv(path: str, n: int = 40) -> pd.DataFrame:
    rng = random.Random(SEED + 2)
    rows = []
    for i in range(n):
        y, m, d = 2023 + rng.randrange(2), 1 + rng.randrange(12), 1 + rng.randrange(28)
        fmt = rng.random()
        if fmt < 0.5:
            occ = f"{d:02d}-{m:02d}-{y:04d}"
        elif fmt < 0.85:
            occ = f"{y:04d}-{m:02d}-{d:02d}"
        else:
            occ = f"{m:02d}/{d:02d}/{y:04d}"  # stray format → NULL in compat
        rows.append(
            {
                "claim_id": f"CLM_{i:07d}",
                "contract_id": f"CTR_{rng.randrange(200):06d}",
                "occurrence_date": occ,
                "declaration_date": f"{y:04d}-{m:02d}-{min(d + 1, 28):02d}",
                "claim_type": rng.choice(CLAIM_TYPES),
                "damage_amount": f"{round(rng.uniform(100, 20000), 2)}€",
                "indemnified_amount": None if rng.random() < 0.42 else f"{round(rng.uniform(50, 15000), 2)}€",
                "status": rng.choice(CLAIM_STATUSES),
                "expert_id": f"EXP_{rng.randrange(40):03d}",
                "liability": rng.choice(LIABILITIES),
            }
        )
    df = pd.DataFrame(rows)
    df.to_csv(path, index=False)
    return df


def telematics_csv(path: str, devices: int = 3, events_per_device: int = 300) -> pd.DataFrame:
    rng = random.Random(SEED + 3)
    rows = []
    base_ms = 1_704_067_200_000  # 2024-01-01 UTC
    for di in range(devices):
        dev = f"{'ab'[di % 2] * 8}{di:024d}"[:32]
        t = base_ms + di * 1000
        lat, lon = 48.85 + di * 0.01, 2.35 + di * 0.01
        for i in range(events_per_device):
            gap = rng.choice([0, 2000, 3000, 4000, 5000])  # dup timestamps too
            t += gap
            if rng.random() < 0.6:
                # POSITION with occasional big jumps (impossible speeds)
                jump = rng.random()
                if jump < 0.05:
                    lat += 0.5  # ~55 km in seconds → filtered >160 km/h
                elif jump < 0.25:
                    lat += 0.002 * rng.uniform(0.8, 1.2)  # fast 110-160 band
                else:
                    lat += 0.00005 * rng.uniform(0, 1)
                lon += 0.00003 * rng.uniform(0, 1)
                rows.append(
                    {
                        "deviceId": dev,
                        "timeMili": float(t),
                        "timestamp": "2024-01-01 00:00:00.000000",
                        "value": f"{lat:.6f},{lon:.6f},{rng.uniform(-20, 100):.1f}",
                        "variable": "POSITION",
                        "alarmClass": rng.randrange(6),
                    }
                )
            else:
                rows.append(
                    {
                        "deviceId": dev,
                        "timeMili": float(t),
                        "timestamp": "2024-01-01 00:00:00.000000",
                        "value": f"{rng.uniform(0, 120):.1f}",
                        "variable": rng.choice(
                            ["EXTERNAL BATTERY", "IGNITION_STATUS", "ENGINE RPM", "Vehicle speed"]
                        ),
                        "alarmClass": rng.randrange(6),
                    }
                )
    # shuffle → out-of-order arrival
    rng.shuffle(rows)
    df = pd.DataFrame(rows)
    df.to_csv(path, index=False)
    return df


def device_mapping_csv(path: str, devices: int = 3) -> pd.DataFrame:
    rows = [
        {
            "deviceId": f"{'ab'[di % 2] * 8}{di:024d}"[:32],
            "customer_id": f"CLI_{di:06d}",
        }
        for di in range(devices)
    ]
    df = pd.DataFrame(rows)
    df.to_csv(path, index=False)
    return df
