"""Geospatial helpers (SURVEY.md §2.8 F13-F17).

Haversine is deliberately a composition of native Column functions —
NOT a UDF — exactly as the reference does
(scripts/08_load_driver_risk_scores.py:55-80), so it runs inside
whole-stage codegen with zero Python round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (lat, lon) pairs."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def speed_kmh(distance_km: Column, time_diff_sec: Column) -> Column:
    """distance/time → km/h (scripts/08_load_driver_risk_scores.py:242)."""
    return F.when(time_diff_sec > 0, distance_km / time_diff_sec * 3600.0)
