"""Property test for the dependency-free PNG codec (multimodal.decode_png):
encode -> decode is the identity over RANDOM pixel content with a RANDOM
filter type chosen PER ROW — the fixed-filter round-trip in test_traindata
exercises each filter in isolation; real encoders mix filters per
scanline, and the reconstruction state (prior row) must carry correctly
across filter switches."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from grepai_spark import multimodal

IMG = st.tuples(
    st.integers(min_value=1, max_value=9),   # height
    st.integers(min_value=1, max_value=9),   # width
    st.sampled_from([1, 3, 4]),              # channels: grey / RGB / RGBA
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.integers(min_value=0, max_value=2**32 - 1),  # filter seed
)


@settings(max_examples=200, deadline=None)
@given(IMG)
def test_png_round_trip_random_content_mixed_row_filters(spec):
    h, w, c, pix_seed, filt_seed = spec
    rng = np.random.default_rng(pix_seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    frng = np.random.default_rng(filt_seed)
    row_filters = frng.integers(0, 5, size=h)
    payload = multimodal.encode_png(
        img, filter_for_row=lambda y: int(row_filters[y])
    )
    got = multimodal.decode_png(payload)
    assert got.shape == (h, w, c)
    assert (got == img).all()
