"""Property-based tests for the RAWV video codec (pure Python — no
Spark session): every frame written by encode_rawv must read back via
decode_video_frame with block-mean features matching an independent
recomputation, at every valid timestamp within the frame's interval;
out-of-range seeks and corrupt headers must fail loudly."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from adsmasterpipeline_spark.operators.multimodal import (
    decode_video_frame, encode_rawv,
)


def expected_strip(frame: bytes, dims: int) -> list[float]:
    # independent model of the block-mean reduction (empty blocks —
    # dims > pixels — repeat the nearest in-range pixel)
    step = len(frame) / dims
    out = []
    for i in range(dims):
        lo, hi = round(i * step), round((i + 1) * step)
        block = frame[lo:hi]
        if not block:
            j = min(lo, len(frame) - 1)
            block = frame[j:j + 1]
        out.append(sum(block) / len(block) / 255.0)
    return out


@settings(max_examples=60, deadline=None)
@given(
    width=st.integers(1, 9),
    height=st.integers(1, 9),
    frame_ms=st.integers(1, 2000),
    dims=st.integers(1, 16),
    frames=st.lists(st.binary(min_size=0, max_size=0), min_size=1,
                    max_size=6),
    data=st.data(),
)
def test_rawv_roundtrip(width, height, frame_ms, dims, frames, data):
    fsize = width * height
    payload_frames = [
        bytes(data.draw(st.lists(st.integers(0, 255), min_size=fsize,
                                 max_size=fsize)))
        for _ in frames]
    payload = encode_rawv(payload_frames, width, height, frame_ms)

    for idx, frame in enumerate(payload_frames):
        # any ts within [idx*frame_ms, (idx+1)*frame_ms) maps to frame idx
        ts = idx * frame_ms + data.draw(st.integers(0, frame_ms - 1))
        got = decode_video_frame(payload, ts, dims)
        assert got == expected_strip(frame, dims)

    with pytest.raises(ValueError):
        decode_video_frame(payload, len(payload_frames) * frame_ms, dims)
    # negative seek must never silently decode header bytes as pixels
    with pytest.raises(ValueError):
        decode_video_frame(payload, -1, dims)


@given(junk=st.binary(min_size=0, max_size=64))
@settings(max_examples=40, deadline=None)
def test_rawv_foreign_bytes_never_crash_silently(junk):
    """Arbitrary non-RAWV bytes raise NotImplementedError (unknown
    codec) — never return garbage features, never raise an unexpected
    error type."""
    if junk[:4] == b"RAWV":
        return  # adversarially forged magic is exercised separately
    with pytest.raises(NotImplementedError):
        decode_video_frame(junk, 0)


def test_rawv_wrong_frame_size_rejected_at_encode():
    with pytest.raises(ValueError, match="width\\*height"):
        encode_rawv([b"\x00" * 5], 2, 2, 40)
