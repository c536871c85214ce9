"""Perceptual-fingerprint invariance properties — the claims the
planted oracle contracts (image_dhash_neardup,
audio_fingerprint_neardup) rely on, proven over adversarial inputs:

- dHash is invariant under any strictly monotone per-pixel intensity
  map (brightness, gain, gamma), and flips when a gradient sign flips;
- the audio sign contour is invariant under positive gain and DC
  offset, and NOT under negation (which reverses every strict
  inequality where samples differ).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from flo_spark.operators.multimodal import dhash64, sign_contour64


@st.composite
def images(draw):
    data = draw(
        st.lists(st.integers(0, 200), min_size=72, max_size=72)
    )
    return np.asarray(data, dtype=np.uint8).reshape(8, 9)


@given(img=images(), shift=st.integers(0, 55), gain=st.sampled_from([1, 2]))
@settings(deadline=None)
def test_dhash_monotone_invariance(img, shift, gain):
    mapped = (img.astype(np.int64) * gain + shift).clip(0, 511)
    assert dhash64(img) == dhash64(mapped)


@given(img=images())
@settings(deadline=None)
def test_dhash_gamma_invariance(img):
    # x -> x^2 is strictly monotone on [0, 255]: order of adjacent
    # pixels — hence every dHash bit — is preserved
    assert dhash64(img) == dhash64(img.astype(np.int64) ** 2)


def test_dhash_flips_on_gradient_sign_change():
    img = np.tile(np.arange(9, dtype=np.int64), (8, 1))  # ascending rows
    h_up = dhash64(img)
    h_down = dhash64(img[:, ::-1])
    assert h_up == (1 << 64) - 1  # every adjacent pair ascends
    assert h_down == 0


@given(
    samples=st.lists(
        st.integers(-30000, 30000), min_size=65, max_size=65
    ),
    gain=st.sampled_from([0.5, 1.0, 2.0]),
    dc=st.integers(-100, 100),
)
@settings(deadline=None)
def test_sign_contour_gain_and_dc_invariance(samples, gain, dc):
    a = np.asarray(samples, dtype=np.float64)
    assert sign_contour64(a) == sign_contour64(a * gain + dc)


@given(samples=st.lists(st.integers(-100, 100), min_size=65, max_size=65))
@settings(deadline=None)
def test_sign_contour_negation_flips_strict_bits(samples):
    a = np.asarray(samples, dtype=np.float64)
    fwd = sign_contour64(a)
    neg = sign_contour64(-a)
    # bits where adjacent samples are EQUAL are 0 in both; everywhere
    # else the strict inequality reverses, so fwd and neg never share
    # a set bit
    assert fwd & neg == 0


def test_sign_contour_rejects_short_input():
    import pytest

    with pytest.raises(ValueError):
        sign_contour64(np.zeros(10))
