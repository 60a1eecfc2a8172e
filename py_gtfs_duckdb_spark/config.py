"""YAML configuration with recursive default merge (reference:
config.py:1-60).

Same default tree and file format; the merge here differs deliberately on
one edge: an explicitly-set falsy value (``False``, ``0``, ``""``) WINS
over the default, where the reference's ``actual if actual else defaults``
silently discards it (config.py:58-60) — setting ``monitor_enabled: false``
in the reference has no effect. Explicit user intent should win; noted for
parity review.
"""

from __future__ import annotations

DEFAULT_CONFIG: dict = {
    "app": {
        "caching_enabled": False,
        "monitor_enabled": True,
        "cors_enabled": True,
        "mqtt_enabled": True,
        "rss_enabled": False,
        "routing": {
            "service_alerts_endpoint": "/gtfs/realtime/service-alerts.pbf",
            "trip_updates_endpoint": "/gtfs/realtime/trip-updates.pbf",
            "vehicle_positions_endpoint": "/gtfs/realtime/vehicle-positions.pbf",
            "rss_endpoint": "/gtfs/realtime/rss.xml",
            "monitor_endpoint": "/monitor",
        },
        "data_review_seconds": 7200,
        "timezone": "Europe/Berlin",
    },
    "caching": {
        "caching_server_endpoint": [],
        "caching_service_alerts_ttl_seconds": 60,
        "caching_trip_updates_ttl_seconds": 30,
        "caching_vehicle_positions_ttl_seconds": 15,
    },
    "matching": {
        "match_against_first_stop_id": True,
        "match_against_stop_ids": False,
        "remove_invalid_stop_ids": True,
    },
    "mqtt": {
        "host": None,
        "port": 1883,
        "client": "gtfslake-realtime",
        "keepalive": 60,
        "username": None,
        "password": None,
        "subscriptions": [],
    },
    "rss": {
        "title": "Public Transport Alerts",
        "description": "Public transport alerts in realtime as RSS feed.",
        "language": "de-DE",
        "base_url": "",
        "media_url": "",
    },
}


def merge_config(defaults: dict, actual: dict | None) -> dict:
    """Recursive merge: dicts merge key-wise, scalars/lists from ``actual``
    win when the key is present (even if falsy), defaults fill the rest."""
    if actual is None:
        return defaults
    if isinstance(defaults, dict) and isinstance(actual, dict):
        out = dict(defaults)
        for k, v in actual.items():
            out[k] = merge_config(defaults.get(k), v) if isinstance(v, dict) else v
        return out
    return actual


def load_config(path: str | None = None) -> dict:
    """Config file (YAML) merged over DEFAULT_CONFIG; no file → defaults."""
    if path is None:
        return merge_config(DEFAULT_CONFIG, {})
    import yaml

    with open(path) as fh:
        return merge_config(DEFAULT_CONFIG, yaml.safe_load(fh) or {})
