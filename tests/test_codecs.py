"""Per-codec unit round-trips on adversarial arrays (no Spark needed).

Mirrors the reference's randomized round-trip strategy
(``tests/test_writer.py:13-40``, seeded rng) plus the adversarial cases
FIXTURES.md calls for: empty block, single row, all-identical, all-distinct,
widths 1..64 bits, unicode / empty strings, escape-heavy text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bids2table_spark.codecs import CODECS, codecs_for_dtype
from bids2table_spark.codecs import bitpack as bp

rng = np.random.default_rng(2022)

INT_CASES = {
    "empty": np.array([], dtype=np.int64),
    "single": np.array([7], dtype=np.int64),
    "all_same": np.full(5000, 42, dtype=np.int64),
    "sorted_runs": np.repeat(np.arange(100), rng.integers(1, 50, 100)).astype(np.int64),
    "all_distinct": rng.permutation(10000).astype(np.int64),
    "negatives": rng.integers(-(2**62), 2**62, 4096).astype(np.int64),
    "extremes": np.array([np.iinfo(np.int64).min, 0, np.iinfo(np.int64).max], dtype=np.int64),
    "monotone_jitter": np.cumsum(rng.integers(1, 300, 8000)).astype(np.int64),
}

STR_CASES = {
    "empty": [],
    "single": ["x"],
    "empties": ["", "", ""],
    "all_same": ["assistant"] * 3000,
    "low_ndv": [["system", "user", "assistant", "tool"][i % 4] for i in range(2000)],
    "unicode": ["héllo wörld 🚀", "日本語テキスト", "", "ascii", "\x00\x01", "ÿ" * 10] * 50,
    "long_runs": ["user"] * 500 + ["assistant"] * 500 + ["tool"] * 7,
    "jsonish": ['{"tool":"bash","args":{"cmd":"ls"},"status":"ok"}'] * 300,
    "distinct": [f"conv-{i:012d}" for i in range(2000)],
}


@pytest.mark.parametrize("width", [0, 1, 2, 3, 7, 8, 13, 31, 32, 33, 63, 64])
def test_bitpack_widths(width):
    n = 1000
    if width == 64:
        vals = rng.integers(0, 2**63, n).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    else:
        vals = rng.integers(0, 2**width if width else 1, n).astype(np.uint64)
    packed = bp.pack_bits(vals, width)
    assert len(packed) == (n * width + 7) // 8
    out = bp.unpack_bits(packed, n, width)
    assert np.array_equal(vals, out)


@pytest.mark.parametrize("case", list(INT_CASES))
@pytest.mark.parametrize("codec_name", codecs_for_dtype("i64"))
def test_int_roundtrip(codec_name, case):
    vals = INT_CASES[case]
    codec = CODECS[codec_name]
    meta, payload = codec.encode(vals, "i64")
    out = np.asarray(codec.decode(meta, payload, len(vals), "i64"))
    assert out.dtype == np.int64 or len(out) == 0
    assert np.array_equal(vals, out.astype(np.int64)), f"{codec_name}/{case}"


@pytest.mark.parametrize("case", list(STR_CASES))
@pytest.mark.parametrize("codec_name", codecs_for_dtype("str"))
def test_str_roundtrip(codec_name, case):
    vals = STR_CASES[case]
    codec = CODECS[codec_name]
    meta, payload = codec.encode(pd.Series(vals, dtype="object"), "str")
    out = codec.decode(meta, payload, len(vals), "str")
    got = out.to_pylist() if hasattr(out, "to_pylist") else list(out)
    assert got == vals, f"{codec_name}/{case}"


def test_compression_effective():
    """Sanity: each codec actually compresses the data shape it targets."""
    role = pd.Series((["user"] * 40 + ["assistant"] * 40 + ["system"]) * 100)
    meta, payload = CODECS["rle"].encode(role, "str")
    raw = sum(len(s) for s in role)
    assert len(payload) < raw / 20

    meta, payload = CODECS["dict"].encode(role, "str")
    assert len(payload) < raw / 4

    ts = np.cumsum(rng.integers(1, 300, 50000)).astype(np.int64) * 10**9
    meta, payload = CODECS["delta"].encode(ts, "i64")
    assert len(payload) < ts.nbytes / 4

    turn = np.tile(np.arange(200), 250).astype(np.int64)
    meta, payload = CODECS["forbp"].encode(turn, "i64")
    assert len(payload) < turn.nbytes / 4

    text = pd.Series(['{"tool":"bash","args":{"cmd":"ls -la /tmp"},"status":"ok"}'] * 2000)
    meta, payload = CODECS["fsst"].encode(text, "str")
    assert len(payload) < sum(len(s) for s in text) / 2


def test_fsst_escape_everything():
    """Text with no repeated symbols must still round-trip (escape path)."""
    vals = ["".join(chr(32 + ((i * 37 + j * 11) % 900)) for j in range(20)) for i in range(50)]
    codec = CODECS["fsst"]
    meta, payload = codec.encode(pd.Series(vals), "str")
    assert codec.decode(meta, payload, len(vals), "str").to_pylist() == vals


def test_fsst_all_symbol_lengths_decode():
    """Decode scatter with symbols of EVERY length 1..8 active at once (pins
    the length-desc prefix-slice scatter in decompress), plus escape bytes
    including literal 0xFF interleaved between matches."""
    from bids2table_spark.codecs import fsst as fm

    syms = [bytes([ord("a") + i] * (i + 1)) for i in range(8)]  # a,bb,...,hhhhhhhh
    table = fm._Table(syms)
    parts = []
    for rep in range(20):
        for i, s in enumerate(syms):
            parts.append(s)
            parts.append(bytes([0xFF if (rep + i) % 3 == 0 else 0x01]))  # no symbol
    raw = b"".join(parts)
    buf = np.frombuffer(raw, dtype=np.uint8)
    stream = fm.compress(buf, table)
    out = fm.decompress(np.asarray(stream, dtype=np.uint8), table, len(buf))
    assert bytes(bytearray(out)) == raw
    # every code 0..7 must appear in the stream so all 8 lengths are exercised
    tok, is_lit = fm._parse_stream(np.asarray(stream, dtype=np.uint8))
    codes = set(np.asarray(stream)[tok][~is_lit].tolist())
    assert codes.issuperset(range(8))


def test_fsst_empty_table_all_escapes():
    """A table with no symbols degrades to pure escape coding."""
    from bids2table_spark.codecs import fsst as fm

    table = fm._Table([])
    raw = bytes(range(256)) * 3
    buf = np.frombuffer(raw, dtype=np.uint8)
    stream = fm.compress(buf, table)
    assert len(stream) == 2 * len(buf)  # escape + literal per byte
    out = fm.decompress(np.asarray(stream, dtype=np.uint8), table, len(buf))
    assert bytes(bytearray(out)) == raw


def test_fsst_multibyte_utf8_straddle():
    """Multi-byte UTF-8 sequences straddling symbol boundaries."""
    vals = ["🚀" * 40, "é" * 33 + "🚀", "日本語" * 21] * 30
    codec = CODECS["fsst"]
    meta, payload = codec.encode(pd.Series(vals), "str")
    assert codec.decode(meta, payload, len(vals), "str").to_pylist() == vals


def test_zigzag_extremes():
    v = np.array([0, -1, 1, np.iinfo(np.int64).min, np.iinfo(np.int64).max], dtype=np.int64)
    assert np.array_equal(bp.unzigzag(bp.zigzag(v)), v)


# ------------------------------------------------- property-based roundtrips

from hypothesis import given, settings, strategies as st  # noqa: E402

_I64 = np.iinfo(np.int64)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=_I64.min, max_value=_I64.max),
            st.integers(min_value=-100, max_value=100),          # dense small
            st.integers(min_value=10**17, max_value=10**17 + 50),  # hot frame
        ),
        min_size=0,
        max_size=500,
    )
)
def test_int_codecs_roundtrip_hypothesis(xs):
    """Every registered i64 codec must bit-roundtrip ARBITRARY int64 data —
    including extremes, mixed magnitudes, and adversarial delta patterns."""
    vals = np.array(xs, dtype=np.int64)
    for name in codecs_for_dtype("i64"):
        codec = CODECS[name]
        meta, payload = codec.encode(vals, "i64")
        out = np.asarray(codec.decode(meta, payload, len(vals), "i64"))
        assert np.array_equal(vals, out.astype(np.int64) if len(out) else vals), name


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(max_size=40),                       # arbitrary unicode
            st.sampled_from(["user", "assistant", ""]),  # low-NDV runs
            st.text(alphabet="ab{}\x00:,", max_size=30),
        ),
        min_size=0,
        max_size=300,
    )
)
def test_str_codecs_roundtrip_hypothesis(xs):
    for name in codecs_for_dtype("str"):
        codec = CODECS[name]
        meta, payload = codec.encode(pd.Series(xs, dtype="object"), "str")
        out = codec.decode(meta, payload, len(xs), "str")
        got = out.to_pylist() if hasattr(out, "to_pylist") else list(out)
        assert got == xs, name


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_fsst_raw_buffer_roundtrip_hypothesis(buf):
    """FSST table build + compress + decompress on arbitrary byte buffers."""
    from bids2table_spark.codecs import fsst as fm

    data = np.frombuffer(buf, dtype=np.uint8)
    table = fm._Table(fm.build_table(data))
    stream = fm.compress(data, table)
    out = fm.decompress(np.asarray(stream, dtype=np.uint8), table, len(data))
    assert bytes(bytearray(out)) == buf


# --------------------------------------- block-container property roundtrips

_ARROW_TYPE = {
    "long": "int64", "int": "int32", "double": "float64", "float": "float32",
    "boolean": "bool_", "string": "large_string", "binary": "large_binary",
}


def _block_roundtrip(values, phys):
    """encode_block_arrow -> decode_block (checksum-verified) == input."""
    import pyarrow as pa

    from bids2table_spark.blocks import decode_block, encode_block_arrow
    from bids2table_spark.selector import choose_codec_local

    if phys.startswith("list<"):
        child = phys[5:-1]
        t = pa.list_(getattr(pa, _ARROW_TYPE[child])())
        arr = pa.array(values, type=t)
    else:
        arr = pa.array(values, type=getattr(pa, _ARROW_TYPE[phys])())
    codec = choose_codec_local(arr, phys)
    row = encode_block_arrow("p", "g", 0, "c", arr, phys, codec)
    out = decode_block(row, verify=True)
    assert out.cast(arr.type).to_pylist() == arr.to_pylist(), (phys, codec)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=_I64.min, max_value=_I64.max),
                  st.integers(-5, 5)),
        max_size=300,
    )
)
def test_block_long_nulls_roundtrip(xs):
    _block_roundtrip(xs, "long")


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=200))
def test_block_string_nulls_roundtrip(xs):
    _block_roundtrip(xs, "string")


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        max_size=200,
    )
)
def test_block_double_nulls_roundtrip(xs):
    import math

    import pyarrow as pa

    from bids2table_spark.blocks import decode_block, encode_block_arrow
    from bids2table_spark.selector import choose_codec_local

    arr = pa.array(xs, type=pa.float64())
    codec = choose_codec_local(arr, "double")
    row = encode_block_arrow("p", "g", 0, "c", arr, "double", codec)
    got = decode_block(row, verify=True).to_pylist()
    want = arr.to_pylist()
    assert len(got) == len(want)
    for a, b in zip(got, want):  # NaN-aware, bitwise for signed zero
        if a is None or b is None:
            assert a is b or (a is None and b is None)
        else:
            assert (math.isnan(a) and math.isnan(b)) or (
                np.float64(a).tobytes() == np.float64(b).tobytes()
            )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(st.one_of(st.none(), st.integers(-1000, 1000)), max_size=8),
        ),
        max_size=120,
    )
)
def test_block_list_long_roundtrip(xs):
    _block_roundtrip(xs, "list<long>")


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=24)), max_size=150))
def test_block_binary_nulls_roundtrip(xs):
    _block_roundtrip(xs, "binary")
