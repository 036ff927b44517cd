"""Dataset annotation CSV builder + GPS alignment.

Reference counterparts: lens/tools/create_data_csv.py:6-58 (haversine +
CSV writer with optional GPS column) and lens/tools/read_gps.py:5-30 (NMEA
parsing via pynmea2).  pynmea2 is not available here, so a minimal clean-room
NMEA sentence parser handles the position sentences (GGA/RMC/GLL).
"""

from __future__ import annotations

import csv
import math
import os
from typing import List, Optional

import numpy as np


def haversine(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    """Great-circle distance in meters.

    Exported for API parity with create_data_csv.py:6-18; nothing in the
    main path calls it (the reference's only consumer, distance_threshold,
    was dead behavior there and is deliberately not reproduced)."""
    R = 6371.0
    lon1, lat1, lon2, lat2 = map(math.radians, (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    a = math.sin(dlat / 2) ** 2 + math.cos(lat1) * math.cos(lat2) * math.sin(dlon / 2) ** 2
    return 2 * R * math.atan2(math.sqrt(a), math.sqrt(1 - a)) * 1000.0


def _nmea_coord(value: str, hemi: str) -> float:
    """ddmm.mmmm / dddmm.mmmm -> signed decimal degrees."""
    if not value:
        return 0.0
    v = float(value)
    deg = int(v // 100)
    minutes = v - deg * 100
    out = deg + minutes / 60.0
    if hemi in ("S", "W"):
        out = -out
    return out


def _nmea_time_seconds(hhmmss: str) -> Optional[float]:
    if len(hhmmss) < 6:
        return None
    try:
        return (
            int(hhmmss[0:2]) * 3600 + int(hhmmss[2:4]) * 60 + float(hhmmss[4:])
        )
    except ValueError:
        return None


def parse_nmea_line(line: str):
    """(lat, lon, time_s) from a GGA/RMC/GLL sentence, else None."""
    line = line.strip()
    if not line.startswith("$"):
        return None
    body = line[1:].split("*")[0]
    f = body.split(",")
    stype = f[0][-3:] if f and len(f[0]) >= 3 else ""
    try:
        if stype == "GGA" and len(f) > 5:
            return _nmea_coord(f[2], f[3]), _nmea_coord(f[4], f[5]), _nmea_time_seconds(f[1])
        if stype == "RMC" and len(f) > 6:
            return _nmea_coord(f[3], f[4]), _nmea_coord(f[5], f[6]), _nmea_time_seconds(f[1])
        if stype == "GLL" and len(f) > 5:
            return _nmea_coord(f[1], f[2]), _nmea_coord(f[3], f[4]), _nmea_time_seconds(f[5])
    except (ValueError, IndexError):
        return None
    return None


def get_gps(nmea_file_path: str) -> np.ndarray:
    """(N, 3) array of (lat, lon, seconds-from-first-fix), deduplicated with
    the reference's > 1e-4 degrees movement filter (read_gps.py:20-26)."""
    lats: List[float] = []
    lons: List[float] = []
    times: List[float] = []
    first_time = None
    prev = (0.0, 0.0)
    with open(nmea_file_path, encoding="utf-8") as f:
        for line in f:
            parsed = parse_nmea_line(line)
            if parsed is None:
                continue
            lat, lon, t = parsed
            if t is not None and first_time is None:
                first_time = t
            if lat == 0 or lon == 0 or (lat, lon) == prev:
                continue
            if math.hypot(lat - prev[0], lon - prev[1]) <= 1e-4:
                continue
            if t is None or first_time is None:
                # A fix without a parseable timestamp cannot be aligned to
                # frame times — recording it as 0.0 would break the elapsed
                # sequence's monotonicity and snap every frame annotation to
                # a wrong fix in create_csv_from_images' catch-up loop.
                continue
            lats.append(lat)
            lons.append(lon)
            times.append(t - first_time)
            prev = (lat, lon)
    return np.stack([lats, lons, times], axis=1) if lats else np.zeros((0, 3))


def create_csv_from_images(
    folder_path: str,
    csv_file_path: str,
    gps_path: Optional[str] = None,
    fps: float = 60.0,
) -> None:
    """Write the `Image_name,index[,gps_coordinate]` annotation CSV for a
    folder of PNG frames, optionally aligning GPS fixes by elapsed time
    (create_data_csv.py:20-58).

    Documented deviations from the reference:
      - the fix pointer catches up with a `while` (create_data_csv.py:50-53
        advances at most ONE fix per frame, so any GPS track denser than the
        frame rate falls progressively behind and every annotation goes
        stale — a silent dataset-corruption bug, fixed here);
      - the reference's `distance_threshold` parameter feeds only a local
        counter that is never written anywhere (create_data_csv.py:46-48),
        so it is dead behavior and is not reproduced.
    """
    png = sorted(f for f in os.listdir(folder_path) if f.endswith(".png"))
    gps = get_gps(gps_path) if gps_path else None

    with open(csv_file_path, "w", newline="") as f:
        writer = csv.writer(f)
        if gps is not None:
            writer.writerow(["Image_name", "index", "gps_coordinate"])
            t = 0.0
            gi = 0
            for index, name in enumerate(png):
                t += 1.0 / fps
                while gi + 1 < len(gps) and t >= gps[gi + 1][2]:
                    gi += 1
                coord = [float(gps[gi][0]), float(gps[gi][1])] if len(gps) else [0.0, 0.0]
                writer.writerow([name, index, coord])
        else:
            writer.writerow(["Image_name", "index"])
            for index, name in enumerate(png):
                writer.writerow([name, index])
