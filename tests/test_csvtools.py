import numpy as np
import pytest

from lens_tpu.tools.csvtools import (
    create_csv_from_images,
    get_gps,
    haversine,
    parse_nmea_line,
)


def test_haversine_known_distance():
    # Paris -> London ~343 km.
    d = haversine(2.3522, 48.8566, -0.1276, 51.5074)
    assert 330_000 < d < 350_000


def test_haversine_zero():
    assert haversine(10.0, 20.0, 10.0, 20.0) == 0.0


def test_parse_nmea_gga():
    line = "$GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*47"
    lat, lon, t = parse_nmea_line(line)
    assert lat == pytest.approx(48.1173, abs=1e-3)
    assert lon == pytest.approx(11.5167, abs=1e-3)
    assert t == pytest.approx(12 * 3600 + 35 * 60 + 19)


def test_parse_nmea_rmc_south_west():
    line = "$GPRMC,081836,A,3751.65,S,14507.36,W,000.0,360.0,130998,011.3,E*62"
    lat, lon, _ = parse_nmea_line(line)
    assert lat < 0 and lon < 0


def test_parse_nmea_rejects_other():
    assert parse_nmea_line("$GPGSV,3,1,11,...") is None
    assert parse_nmea_line("garbage") is None


def test_get_gps_dedup(tmp_path):
    p = tmp_path / "track.nmea"
    p.write_text(
        "$GPGGA,120000,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*47\n"
        "$GPGGA,120001,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*47\n"  # dup
        "$GPGGA,120002,4808.038,N,01132.000,E,1,08,0.9,545.4,M,46.9,M,,*47\n"
    )
    gps = get_gps(str(p))
    assert gps.shape == (2, 3)  # duplicate fix dropped
    assert gps[1, 2] == pytest.approx(2.0)  # seconds from first fix


def test_create_csv(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(np.zeros((4, 4), np.uint8)).save(img_dir / f"f_{i}.png")
    csv_path = tmp_path / "ann.csv"
    create_csv_from_images(str(img_dir), str(csv_path))
    lines = csv_path.read_text().strip().split("\n")
    assert lines[0] == "Image_name,index"
    assert lines[1].startswith("f_0.png,0")
    assert len(lines) == 4


def test_get_gps_skips_fixes_without_timestamps(tmp_path):
    """A fix whose sentence has no parseable time cannot be aligned to
    frame times — recording it as elapsed 0.0 would break monotonicity and
    snap every frame annotation to a wrong fix (review regression)."""
    p = tmp_path / "mixed.nmea"
    p.write_text(
        # GGA with time, GLL without one, GGA with a later time.
        "$GPGGA,120000.0,2730.0000,S,15300.0000,E,1,8,1.0,10.0,M,,M,,\n"
        "$GPGLL,2731.0000,S,15301.0000,E,,A\n"
        "$GPGGA,120010.0,2732.0000,S,15302.0000,E,1,8,1.0,10.0,M,,M,,\n"
    )
    gps = get_gps(str(p))
    assert gps.shape[0] == 2  # the timeless GLL fix is skipped
    times = gps[:, 2]
    assert (np.diff(times) > 0).all()  # strictly increasing elapsed times
