"""Exif APP1 build/inject/probe (sources/exif.py)."""

import numpy as np
import pytest

from setsketch_ray.sources.codec import decode_image
from setsketch_ray.sources.exif import (build_exif_app1, exif_info,
                                        inject_app1)
from setsketch_ray.sources.images import generate_rows


@pytest.fixture(scope="module")
def jpeg_blob():
    rows = generate_rows(np.arange(1), fmt_profile="jpeg")
    return rows["bytes"][0].as_py()


@pytest.mark.parametrize("endian,tag", [("<", "II"), (">", "MM")])
def test_exif_round_trip_both_endians(jpeg_blob, endian, tag):
    app1 = build_exif_app1("CAMERA-LONG-NAME", "M3", 6, (300, 2),
                           "2024:02:29 23:59:59", 1600,
                           "2024:02:29 23:59:58", endian)
    j2 = inject_app1(jpeg_blob, app1)
    info = exif_info(j2)
    assert info == {
        "endian": tag, "make": "CAMERA-LONG-NAME", "model": "M3",
        "orientation": 6, "n_tags0": 6, "xres_num": 300, "xres_den": 2,
        "datetime": "2024:02:29 23:59:59", "iso": 1600,
        "datetime_original": "2024:02:29 23:59:58"}
    # the splice never touches the entropy stream
    assert (decode_image(j2, "jpg") == decode_image(jpeg_blob, "jpg")).all()


def test_exif_absent_and_malformed(jpeg_blob):
    assert exif_info(jpeg_blob) == {}          # no APP1 at all
    assert exif_info(b"\x00\x01") == {}        # not a JPEG
    # APP1 present but not Exif-tagged (e.g. XMP) -> skipped cleanly
    import struct

    xmp = b"http://ns.adobe.com/xap/1.0/\x00<x/>"
    j2 = jpeg_blob[:2] + b"\xff\xe1" + struct.pack(">H", len(xmp) + 2) + \
        xmp + jpeg_blob[2:]
    assert exif_info(j2) == {}


def test_exif_inline_vs_pointer_values(jpeg_blob):
    # "M1" (3 bytes with NUL) rides inline; make > 4 bytes via pointer —
    # both decode identically
    app1 = build_exif_app1("LONGMAKE", "M1", 1, (72, 1),
                           "2024:01:01 00:00:00", 100,
                           "2024:01:01 00:00:00", "<")
    info = exif_info(inject_app1(jpeg_blob, app1))
    assert info["make"] == "LONGMAKE" and info["model"] == "M1"


def test_inject_requires_soi():
    with pytest.raises(ValueError):
        inject_app1(b"PNG...", b"Exif\x00\x00")
