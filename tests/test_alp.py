"""ALP double codec: bit-identical round-trips on decimals-in-disguise,
pathological floats, and selector integration."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from bids2table_spark.codecs import get_codec
from bids2table_spark.codecs.alp import AlpCodec, choose_exponent
from bids2table_spark.codecs.base import DTYPE_F64


def _roundtrip(vals: np.ndarray) -> np.ndarray:
    c = AlpCodec()
    meta, payload = c.encode(vals, DTYPE_F64)
    out = c.decode(meta, payload, len(vals), DTYPE_F64)
    return np.asarray(out)


def _assert_bits_equal(a: np.ndarray, b: np.ndarray):
    np.testing.assert_array_equal(
        np.asarray(a, dtype=np.float64).view(np.int64),
        np.asarray(b, dtype=np.float64).view(np.int64),
    )


def test_decimal_prices_compress():
    rng = np.random.default_rng(3)
    vals = np.round(rng.uniform(0, 10000, 50000), 2)  # 2-decimal prices
    c = AlpCodec()
    meta, payload = c.encode(vals, DTYPE_F64)
    assert meta["n_exc"] == 0
    assert len(payload) < 0.45 * vals.nbytes  # ~20 bits vs 64
    _assert_bits_equal(_roundtrip(vals), vals)


def test_pathological_values_roundtrip():
    vals = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, 1e308, -1e-308, np.pi,
         0.1, 2.0**-1074, 1.5, float(1 << 52)],
        dtype=np.float64,
    )
    out = _roundtrip(vals)
    _assert_bits_equal(out, vals)  # NaN bits, -0.0 sign, subnormals preserved


def test_mixed_exact_and_exceptions():
    rng = np.random.default_rng(5)
    vals = np.round(rng.uniform(-5, 5, 10000), 3)
    vals[::97] = rng.standard_normal(len(vals[::97]))  # ~1% true randoms
    c = AlpCodec()
    meta, payload = c.encode(vals, DTYPE_F64)
    assert 0 < meta["n_exc"] <= len(vals) // 50
    _assert_bits_equal(_roundtrip(vals), vals)


def test_choose_exponent_prefers_smallest():
    vals = np.array([1.0, 2.0, 3.0])
    e, hit = choose_exponent(vals)
    assert e == 0 and hit == 1.0
    vals = np.array([0.25, 0.5])  # needs e=2
    e, hit = choose_exponent(vals)
    assert e == 2 and hit == 1.0


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            st.decimals(
                min_value=-10**8, max_value=10**8, places=4, allow_nan=False
            ).map(float),
        ),
        min_size=0,
        max_size=300,
    )
)
def test_alp_roundtrip_hypothesis(xs):
    vals = np.array(xs, dtype=np.float64)
    _assert_bits_equal(_roundtrip(vals), vals)


def test_selector_picks_alp_on_metric_column():
    from bids2table_spark.selector import choose_codec_local

    import pandas as pd

    rng = np.random.default_rng(7)
    metric = pd.Series(np.round(rng.uniform(0, 100, 20000), 2))
    assert choose_codec_local(metric, "double") == "alp"
    randoms = pd.Series(rng.standard_normal(20000))
    assert choose_codec_local(randoms, "double") == "plain"


def test_alp_in_registry():
    assert get_codec("alp").name == "alp"


# ------------------------------------------------------------- f32 variant

def _roundtrip32(vals: np.ndarray) -> np.ndarray:
    from bids2table_spark.codecs.base import DTYPE_F32

    c = AlpCodec()
    meta, payload = c.encode(vals, DTYPE_F32)
    out = c.decode(meta, payload, len(vals), DTYPE_F32)
    assert np.asarray(out).dtype == np.float32
    return np.asarray(out)


def _assert_bits32(a: np.ndarray, b: np.ndarray):
    np.testing.assert_array_equal(
        np.asarray(a, dtype=np.float32).view(np.int32),
        np.asarray(b, dtype=np.float32).view(np.int32),
    )


def test_f32_decimal_metrics_compress():
    from bids2table_spark.codecs.base import DTYPE_F32

    rng = np.random.default_rng(11)
    vals = np.round(rng.uniform(-500, 500, 50000), 2).astype(np.float32)
    c = AlpCodec()
    meta, payload = c.encode(vals, DTYPE_F32)
    # only -0.0 may need its sign bit carried as an exception
    assert meta["n_exc"] <= np.sum(vals.view(np.int32) == np.int32(-(2**31)))
    assert len(payload) < 0.75 * vals.nbytes  # ~17 bits vs 32
    _assert_bits32(_roundtrip32(vals), vals)


def test_f32_pathological_roundtrip():
    vals = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, 3.4e38, 1.4e-45, np.pi,
         0.1, 1.5, float(1 << 24), 123.45],
        dtype=np.float32,
    )
    _assert_bits32(_roundtrip32(vals), vals)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=32),
            st.decimals(
                min_value=-10**5, max_value=10**5, places=2, allow_nan=False
            ).map(float),
        ),
        min_size=0,
        max_size=300,
    )
)
def test_f32_roundtrip_hypothesis(xs):
    vals = np.array(xs, dtype=np.float32)
    _assert_bits32(_roundtrip32(vals), vals)


def test_selector_picks_alp_on_f32_metric():
    import pandas as pd

    from bids2table_spark.selector import choose_codec_local

    rng = np.random.default_rng(13)
    metric = pd.Series(np.round(rng.uniform(0, 100, 20000), 2).astype(np.float32))
    assert choose_codec_local(metric, "float") == "alp"
    randoms = pd.Series(rng.standard_normal(20000).astype(np.float32))
    assert choose_codec_local(randoms, "float") == "plain"


def test_block_level_f32_roundtrip_with_nulls():
    import pyarrow as pa

    from bids2table_spark.blocks import decode_block, encode_block_arrow

    vals = [1.25, None, 3.5, -0.75, None, 123.45]
    arr = pa.array(vals, type=pa.float32())
    row = encode_block_arrow("p", "g", 0, "m", arr, "float", "alp")
    out = decode_block(row, verify=True)
    assert out.to_pylist() == [None if v is None else np.float32(v) for v in vals]


def test_block_level_double_roundtrip_with_nulls():
    import pyarrow as pa

    from bids2table_spark.blocks import decode_block, encode_block_arrow

    vals = [1.25, None, 3.5, -0.75, None, 1e6]
    arr = pa.array(vals, type=pa.float64())
    row = encode_block_arrow("p", "g", 0, "m", arr, "double", "alp")
    out = decode_block(row, verify=True)
    assert out.to_pylist() == vals
