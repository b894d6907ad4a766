"""Detector parameters.

Mirrors the reference's INI thresholds (reference hha.conf:26-30, parsed
at hha.py:98-102) as a typed dataclass; thresholds become query
parameters instead of module-level globals baked into the plan.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass


@dataclass(frozen=True)
class DetectorParams:
    """Spike-detection thresholds (reference hha.conf defaults)."""

    # seconds between detection cycles (hha.conf:26)
    sleep_interval: int = 10
    # synthetic "previous" value for never-seen /32 keys (hha.conf:27)
    limit_new_data: int = 2500
    # same, for /24 network keys (hha.conf:28)
    limit_new_data_net: int = 3500
    # cur/prev ratio that triggers an alert (hha.conf:29)
    quotient_amplification: int = 3
    # alert dedup TTL in seconds (hha.conf:30)
    limit_detect_time_sec: int = 300
    # current window length in seconds (hha.py:320: now-90)
    cur_window_sec: int = 90
    # previous window cutoff in seconds (hha.py:322: now-300)
    prev_window_sec: int = 300
    # how many hourly files of history a cycle reads (hha.py:147,293-297
    # physically bounds the previous window to the current + previous
    # hourly file; 2 reproduces that lower bound exactly)
    history_hours: int = 2

    @classmethod
    def from_ini(cls, path: str) -> "DetectorParams":
        """Load from an hha.conf-style INI file ([other] section)."""
        cp = configparser.ConfigParser()
        read = cp.read(path)
        if not read:
            raise FileNotFoundError(path)
        other = cp["other"]
        return cls(
            sleep_interval=other.getint("sleepInterval", 10),
            limit_new_data=other.getint("LimitNewData", 2500),
            limit_new_data_net=other.getint("LimitNewDataNet", 3500),
            quotient_amplification=other.getint("quotientAmplification", 3),
            limit_detect_time_sec=other.getint("LimitDetectTimeSec", 300),
        )
