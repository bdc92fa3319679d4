"""Property-based tests (hypothesis) for the ops library against pure-Python
reference models — random inputs, not just the testdata distributions."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from marasa_spark.ops.asof import asof_join, asof_join_union
from marasa_spark.ops.dedup import char_shingles, jaccard_pairs

import pytest
# round 12: heavy property/soak tier — deselected from the default
# driver-stampable run (see conftest); MARASA_FULL_SUITE=1 restores it
pytestmark = pytest.mark.slow


# -- as-of join ------------------------------------------------------------

event = st.tuples(
    st.integers(0, 2),      # key
    st.integers(0, 1000),   # ts offset (seconds; may collide → seq breaks tie)
)
events_list = st.lists(event, min_size=1, max_size=20)


def _ts(offset: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=offset)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(lefts=events_list, rights=events_list)
def test_asof_join_matches_reference(spark, lefts, rights):
    l_rows = [(i, k, _ts(t)) for i, (k, t) in enumerate(lefts)]
    r_rows = [(i, k, _ts(t)) for i, (k, t) in enumerate(rights)]
    l_df = spark.createDataFrame(l_rows, "l_id long, key long, l_ts timestamp")
    r_df = spark.createDataFrame(r_rows, "r_id long, key long, r_ts timestamp")
    got = {
        (r["l_id"], r["r_id"])
        for r in asof_join(
            l_df, r_df, on="key", left_ts="l_ts", right_ts="r_ts",
            right_seq="r_id", left_seq="l_id",
        ).collect()
    }
    # reference: for each left row, the right row with max (r_ts, r_id)
    # among r_ts <= l_ts on the same key
    want = set()
    for l_id, lk, lts in l_rows:
        cands = [(rts, r_id) for r_id, rk, rts in r_rows if rk == lk and rts <= lts]
        if cands:
            want.add((l_id, max(cands)[1]))
    assert got == want
    got_union = {
        (r["l_id"], r["r_id"])
        for r in asof_join_union(
            l_df, r_df, on="key", left_ts="l_ts", right_ts="r_ts",
            right_seq="r_id", left_seq="l_id",
        ).collect()
    }
    assert got_union == want


# -- jaccard pairs ---------------------------------------------------------

doc_text = st.lists(
    st.sampled_from(["join", "filter", "scan", "sort", "agg", "map"]),
    min_size=1,
    max_size=6,
).map(" ".join)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(doc_text, min_size=2, max_size=8))
def test_jaccard_pairs_matches_reference(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    want = {}
    for i, ta in rows:
        for j, tb in rows:
            if i >= j:
                continue
            sa, sb = set(ta.split(" ")), set(tb.split(" "))
            jac = len(sa & sb) / len(sa | sb)
            if jac >= 0.5:
                want[(i, j)] = round(jac, 9)
    assert got == want


def test_char_shingles(spark):
    df = spark.createDataFrame([(1, "abcdefg"), (2, "abc")], "id long, t string")
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", char_shingles(F.col("t"), 5).alias("sh")).collect()
    }
    assert got[1] == ["abcde", "bcdef", "cdefg"]
    assert got[2] == ["abc"]  # shorter than n → the single truncated shingle


# ---------------------------------------------------------------------------
# z-order interleave (ops/layout.py)
# ---------------------------------------------------------------------------

xy_pairs = st.lists(
    st.tuples(st.integers(0, 255), st.integers(0, 255)),
    min_size=1,
    max_size=40,
    unique=True,
)


@settings(deadline=None, max_examples=15, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pts=xy_pairs)
def test_z_interleave_bijective_and_tile_local(spark, pts):
    """z is a bijection [0,255]² → [0,65535] (distinct inputs → distinct
    z), and the bucket (z div 4096) determines 64-aligned tile bounds on
    BOTH coordinates — the soundness property m27/m31 pruning relies on."""
    from marasa_spark.ops.layout import z_interleave

    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select(
        "x", "y", z_interleave(F.col("x"), F.col("y")).alias("z")
    ).collect()
    zs = [r["z"] for r in rows]
    assert len(set(zs)) == len(zs)
    for r in rows:
        assert 0 <= r["z"] <= 65535
        b = r["z"] // 4096
        px_base = 64 * (((b >> 2) & 1) * 2 + (b & 1))
        sx_base = 64 * (((b >> 3) & 1) * 2 + ((b >> 1) & 1))
        assert px_base <= r["x"] <= px_base + 63
        assert sx_base <= r["y"] <= sx_base + 63


# ---------------------------------------------------------------------------
# heavy hitters (ops/freq.py) — two-pass == naive on arbitrary corpora
# ---------------------------------------------------------------------------

hh_docs = st.lists(
    st.lists(st.integers(0, 60), min_size=1, max_size=30).map(
        lambda toks: " ".join(f"w{t}" for t in toks)
    ),
    min_size=1,
    max_size=25,
)


@settings(deadline=None, max_examples=10, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=hh_docs)
def test_heavy_hitters_exact_matches_naive(spark, texts):
    from marasa_spark.ops.freq import heavy_hitters_exact

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(3)
    theta = 0.05
    got = {
        (r["token"], r["n"])
        for r in heavy_hitters_exact(df, "text", theta=theta, k=25).collect()
    }
    toks = df.select(F.explode(F.split("text", " ")).alias("token"))
    total = toks.count()
    want = {
        (r["token"], r["n"])
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n").cast("double") >= theta * float(total))
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# PNG reference codec: encode→decode identity for arbitrary images
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    width=st.integers(1, 40),
    height=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_codec_roundtrip_identity(width, height, seed):
    """Pure-Python property: for ANY dimensions and pixel content, the
    filtered encoder (cycling all five RFC 2083 filters) and the reference
    decoder are exact inverses — the correctness core under k81, with no
    Spark in the loop so hypothesis can sweep the space cheaply."""
    from marasa_spark.ops.multimodal import (
        decode_png_pixels,
        synthesize_png_filtered,
    )

    def px(x: int, y: int) -> int:
        return (seed + 31 * x + 17 * y + x * y) % 256

    blob = synthesize_png_filtered(width, height, px)
    w, h, ch, pixels = decode_png_pixels(blob)
    assert (w, h, ch) == (width, height, 1)
    want = bytes(px(x, y) for y in range(height) for x in range(width))
    assert pixels == want


@settings(max_examples=60, deadline=None)
@given(
    width=st.integers(1, 40),
    height=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
    color_type=st.sampled_from([0, 2]),
    interlace=st.sampled_from([0, 1]),
)
def test_png_codec_roundtrip_color_interlace(width, height, seed, color_type, interlace):
    """VERDICT r7 #4: the widened codec — truecolor (3-byte pixels, so the
    unfilter's left/upper-left references shift by bpp) and Adam7 (seven
    independently-filtered sub-images re-rastered) — is an exact inverse
    of the encoder for ANY dimensions, including the degenerate ones where
    several interlace passes are empty (w or h < 5)."""
    from marasa_spark.ops.multimodal import (
        decode_png_pixels,
        synthesize_png_filtered,
    )

    if color_type == 0:
        def px(x: int, y: int) -> int:
            return (seed + 31 * x + 17 * y + x * y) % 256

        def flat(x: int, y: int):
            return (px(x, y),)
    else:
        def px(x: int, y: int):
            return (
                (seed + 31 * x) % 256,
                (seed // 7 + 17 * y) % 256,
                (seed // 13 + x * y + 5) % 256,
            )

        flat = px

    blob = synthesize_png_filtered(width, height, px, color_type, interlace)
    w, h, ch, pixels = decode_png_pixels(blob)
    assert (w, h, ch) == (width, height, 1 if color_type == 0 else 3)
    want = bytes(
        c for y in range(height) for x in range(width) for c in flat(x, y)
    )
    assert pixels == want


@settings(max_examples=60, deadline=None)
@given(
    width=st.integers(1, 32),
    height=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    color_depth=st.sampled_from(
        # every LEGAL (color_type, bit_depth) of RFC 2083 — the byte depths
        # plus the sub-byte gray/palette depths added this round
        [(0, 8), (0, 16), (2, 8), (2, 16), (3, 8), (4, 8), (4, 16), (6, 8), (6, 16),
         (0, 1), (0, 2), (0, 4), (3, 1), (3, 2), (3, 4)]
    ),
    interlace=st.sampled_from([0, 1]),
)
def test_png_codec_roundtrip_full_matrix(width, height, seed, color_depth, interlace):
    """Round 8 codec completion: palette (PLTE index expansion), gray+alpha,
    RGBA, 16-bit samples (2-byte bpp shifts every unfilter reference;
    big-endian pair recombination), and sub-byte depths (packed-byte
    filtering at bpp = 1, MSB-first unpack, per-row pad bits) — the encoder
    and reference decoder are exact inverses over the WHOLE legal
    (color_type, depth, interlace) matrix, any dimensions, including
    degenerate Adam7 rasters."""
    from marasa_spark.ops.multimodal import (
        decode_png_pixels,
        synthesize_png_filtered,
    )

    color_type, depth = color_depth
    lim = 1 << depth
    n_pal = 1 + seed % min(16, lim)
    pal = [
        ((7 * i + seed) % 256, (11 * i + 3) % 256, (13 * i + 7) % 256)
        for i in range(n_pal)
    ]
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    if color_type == 3:
        def px(x: int, y: int) -> int:
            return (x + 3 * y + seed) % n_pal

        def flat(x: int, y: int):
            return pal[px(x, y)]
    elif n_ch == 1:
        def px(x: int, y: int) -> int:
            return (seed + 31 * x + 17 * y + x * y) % lim

        def flat(x: int, y: int):
            return (px(x, y),)
    else:
        def px(x: int, y: int):
            return tuple(
                (seed + 31 * x + 17 * y + c * (seed % 97 + 1)) % lim
                for c in range(n_ch)
            )

        flat = px

    blob = synthesize_png_filtered(
        width, height, px, color_type, interlace, depth,
        pal if color_type == 3 else None,
    )
    w, h, ch, samples = decode_png_pixels(blob)
    assert (w, h) == (width, height)
    assert ch == (3 if color_type in (2, 3) else n_ch)
    want = [
        c for y in range(height) for x in range(width) for c in flat(x, y)
    ]
    assert list(samples) == want


# ---------------------------------------------------------------------------
# WAV/PCM reference codec: encode→decode identity for arbitrary clips
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    frames=st.integers(1, 200),
    channels=st.integers(1, 4),
    bits=st.sampled_from([8, 16, 24]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_codec_roundtrip_identity(frames, channels, bits, rate, seed):
    """The audio twin of the PNG round-trip property (k85's correctness
    core, no Spark in the loop): for ANY frame count, channel count, PCM
    width, and sample content, the RIFF/WAVE encoder and the reference
    decoder are exact inverses — including odd-length 8-bit data chunks
    (RIFF word alignment), 3-byte signed 24-bit packing (round 10), and
    stereo interleaving."""
    from marasa_spark.ops.multimodal import decode_wav_samples, synthesize_wav_pcm

    n = frames * channels
    if bits == 8:
        samples = [(seed + 7 * j) % 256 for j in range(n)]
    elif bits == 24:
        samples = [((seed + 7919 * j) % (1 << 24)) - (1 << 23) for j in range(n)]
    else:
        samples = [((seed + 7 * j) % 65536) - 32768 for j in range(n)]
    blob = synthesize_wav_pcm(samples, channels, rate, bits)
    ch, got_rate, got_bits, got = decode_wav_samples(blob)
    assert (ch, got_rate, got_bits) == (channels, rate, bits)
    assert got == samples


@settings(max_examples=40, deadline=None)
@given(
    frames=st.integers(1, 120),
    channels=st.integers(1, 3),
    bits=st.sampled_from([32, 64]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_float_roundtrip_exact_on_binary32_values(frames, channels, bits, seed):
    """IEEE-float WAV (format 3, round 10): the encoder and decoder are
    exact inverses for any value already representable at the stored
    width. Fixtures are dyadic rationals v/256 with |v| <= 32768 —
    binary32-exact — so the binary64 widening on decode reproduces them
    bit-for-bit at both widths, the exactness k94's integer-unit oracle
    rests on."""
    from marasa_spark.ops.multimodal import decode_wav_samples, synthesize_wav_float

    n = frames * channels
    vs = [((seed + 104729 * j) % 65537) - 32768 for j in range(n)]
    samples = [v / 256.0 for v in vs]
    blob = synthesize_wav_float(samples, channels, 8000, bits)
    ch, rate, got_bits, got = decode_wav_samples(blob)
    assert (ch, rate, got_bits) == (channels, 8000, bits)
    assert got == samples
    assert [int(s * 65536) for s in got] == [256 * v for v in vs]


def test_wav_codec_rejects_non_pcm_and_truncation():
    """The declared external-codec boundary: non-PCM audio_format raises
    NotImplementedError (where a real audio lib would plug in), and
    malformed containers raise ValueError rather than mis-decoding."""
    import struct

    import pytest as _pytest

    from marasa_spark.ops.multimodal import decode_wav_samples, synthesize_wav_pcm

    good = synthesize_wav_pcm([1, -2, 3, -4], 2, 8000, 16)
    # patch audio_format (first 2 bytes of the fmt body at offset 20) to
    # 2 = MS-ADPCM (compressed) — the decoder must refuse, not misread.
    # Format 3 IEEE float became a REAL decode path in round 10, but only
    # at its legal widths: format 3 at bits=16 must still refuse.
    non_pcm = good[:20] + struct.pack("<H", 2) + good[22:]
    with _pytest.raises(NotImplementedError):
        decode_wav_samples(non_pcm)
    float16 = good[:20] + struct.pack("<H", 3) + good[22:]
    with _pytest.raises(NotImplementedError):
        decode_wav_samples(float16)
    with _pytest.raises(ValueError):
        decode_wav_samples(b"RIFX" + good[4:])
    with _pytest.raises(ValueError):
        decode_wav_samples(good[:12])  # fmt/data chunks missing
    # fmt chunk shorter than the 16-byte PCM descriptor: ValueError (the
    # documented contract), not a struct.error escaping from the unpack
    short_fmt = (
        good[:4]
        + struct.pack("<I", 12 + 8 + 8)
        + good[8:12]
        + b"fmt "
        + struct.pack("<I", 8)
        + good[20:28]
    )
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav_samples(short_fmt)


# ---------------------------------------------------------------------------
# JPEG reference codec: baseline grayscale entropy decode
# ---------------------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(
    bw=st.integers(1, 5),
    bh=st.integers(1, 5),
    crop_x=st.integers(0, 7),
    crop_y=st.integers(0, 7),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_block_constant_roundtrip_exact(bw, bh, crop_x, crop_y, seed):
    """k87's correctness core: a block-constant image with an all-ones
    quant table holds only DC coefficients, so encode → entropy decode →
    IDCT is EXACT for any block grid and any non-multiple-of-8 crop."""
    from marasa_spark.ops.jpeg import decode_jpeg_gray, synthesize_jpeg_gray

    w = bw * 8 - crop_x
    h = bh * 8 - crop_y
    if w <= 0 or h <= 0:
        return

    def fn(bx: int, by: int) -> int:
        return (seed + bx * 31 + by * 17) % 256

    blob = synthesize_jpeg_gray(w, h, fn)
    W, H, px = decode_jpeg_gray(blob)
    assert (W, H) == (w, h)
    assert all(
        px[y * w + x] == fn(x // 8, y // 8) for y in range(h) for x in range(w)
    )


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    restart_interval=st.sampled_from([0, 0, 1, 3, 5]),
)
def test_jpeg_arbitrary_coefficients_match_independent_idct(w, h, seed, restart_interval):
    """The entropy paths block-constant fixtures can't reach — AC
    run/size symbols, ZRL (16-zero runs), mid-block EOB, non-trivial
    quant tables, and DRI restart markers (byte re-alignment + DC
    predictor reset) — decode to EXACTLY the pixels an independent
    numpy-matrix IDCT produces from the same coefficients."""
    import math as _math
    import random as _random

    import numpy as np

    from marasa_spark.ops.jpeg import (
        ZIGZAG,
        decode_jpeg_gray,
        synthesize_jpeg_from_coefficients,
    )

    rng = _random.Random(seed)
    nb = ((w + 7) // 8) * ((h + 7) // 8)
    quant = [rng.randint(1, 32) for _ in range(64)]
    blocks = []
    for _ in range(nb):
        blk = [0] * 64
        blk[0] = rng.randint(-200, 200)
        for _ in range(rng.randint(0, 12)):
            blk[rng.randint(1, 63)] = rng.randint(-100, 100)
        blocks.append(blk)
    blob = synthesize_jpeg_from_coefficients(w, h, blocks, quant, restart_interval)
    W, H, px = decode_jpeg_gray(blob)
    assert (W, H) == (w, h)

    C = np.array(
        [
            [
                (_math.sqrt(0.5) if u == 0 else 1.0)
                * _math.cos((2 * x + 1) * u * _math.pi / 16)
                / 2.0
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    bw = (w + 7) // 8
    want = np.zeros((h, w), dtype=int)
    for bi, blk in enumerate(blocks):
        m = np.zeros((8, 8))
        for k in range(64):
            m[ZIGZAG[k] // 8][ZIGZAG[k] % 8] = blk[k] * quant[ZIGZAG[k]]
        pix = np.floor(C.T @ m @ C + 128.5).astype(int).clip(0, 255)
        by, bx = divmod(bi, bw)
        for y in range(min(8, h - by * 8)):
            for x in range(min(8, w - bx * 8)):
                want[by * 8 + y][bx * 8 + x] = pix[y][x]
    assert px == want.flatten().tolist()


def test_jpeg_codec_rejects_the_declared_slot():
    """Color/progressive JPEG raises NotImplementedError (the external-
    codec boundary), malformed streams raise ValueError."""
    import pytest as _pytest

    from marasa_spark.ops.jpeg import decode_jpeg_gray, synthesize_jpeg_gray

    blob = synthesize_jpeg_gray(16, 16, lambda bx, by: 128)
    # patch SOF0 (FFC0) to SOF2 (FFC2): progressive
    progressive = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(NotImplementedError):
        decode_jpeg_gray(progressive)
    with _pytest.raises(ValueError):
        decode_jpeg_gray(b"\x00\x01" + blob[2:])
    with _pytest.raises(ValueError):
        decode_jpeg_gray(blob[:40])  # truncated before any scan


def test_jpeg_codec_rejects_dnl_deferred_dimensions():
    """SOF0 with height 0 means 'height supplied later via DNL' (T.81
    B.2.2/B.2.5) — a declared NotImplementedError slot, not an empty
    image that downstream stats would crash on."""
    import struct as _struct

    import pytest as _pytest

    from marasa_spark.ops.jpeg import decode_jpeg_gray, synthesize_jpeg_gray

    blob = synthesize_jpeg_gray(16, 16, lambda bx, by: 128)
    i = blob.index(b"\xff\xc0")
    # SOF0 body: len(2) precision(1) height(2) width(2) — zero the height
    patched = blob[: i + 5] + _struct.pack(">H", 0) + blob[i + 7 :]
    with _pytest.raises(NotImplementedError):
        decode_jpeg_gray(patched)


def test_jpeg_coefficient_synth_rejects_oversized_dc_diff():
    """A DC diff outside baseline category 11 (|diff| > 2047) must raise a
    descriptive ValueError, mirroring the AC magnitude check — not a bare
    KeyError from the Huffman code table."""
    import pytest as _pytest

    from marasa_spark.ops.jpeg import synthesize_jpeg_from_coefficients

    blk = [0] * 64
    blk[0] = 5000  # category 13 > the baseline DC table's max of 11
    with _pytest.raises(ValueError, match="category"):
        synthesize_jpeg_from_coefficients(8, 8, [blk], [1] * 64)


# ---------------------------------------------------------------------------
# GIF reference codec: LZW + animated container + frame sampling
# ---------------------------------------------------------------------------

@settings(max_examples=50, deadline=None)
@given(
    ncol=st.sampled_from([2, 4, 7, 16, 99, 128, 256]),
    n=st.integers(1, 6000),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_lzw_roundtrip_identity(ncol, n, seed):
    """The LZW layer alone: REAL compression (growing dictionary, dynamic
    code sizes 3..12 bits, CLEAR emitted when the table fills at 4096)
    and the decoder (KwKwK special case included) are exact inverses for
    any index stream — runs included, which grow the table fastest."""
    import random as _random

    from marasa_spark.ops.multimodal import _lzw_decode, _lzw_encode

    rng = _random.Random(seed)
    mcs = max(2, (ncol - 1).bit_length())
    idx: list = []
    while len(idx) < n:
        if rng.random() < 0.5:
            idx.extend([rng.randrange(ncol)] * rng.randint(1, 40))
        else:
            idx.append(rng.randrange(ncol))
    idx = idx[:n]
    assert _lzw_decode(_lzw_encode(idx, mcs), mcs, n) == idx


@settings(max_examples=30, deadline=None)
@given(
    width=st.integers(1, 24),
    height=st.integers(1, 24),
    n_frames=st.integers(1, 7),
    ncol=st.sampled_from([3, 8, 17, 64]),
    every=st.sampled_from([1, 2, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_animated_roundtrip_and_frame_sampling(width, height, n_frames, ncol, every, seed):
    """k89's correctness core: the animated container round-trips through
    real LZW per frame, and frame sampling returns exactly the every-th
    frames with their true palette-expanded pixels (unsampled frames are
    never inflated — verified indirectly: their content cannot leak into
    the sampled output)."""
    from marasa_spark.ops.multimodal import decode_gif_frames, synthesize_gif_animated

    pal = [
        ((7 * j + seed) % 256, (11 * j + 3) % 256, (13 * j + 7) % 256)
        for j in range(ncol)
    ]

    def fn(x: int, y: int, f: int) -> int:
        return (x + 3 * y + 5 * f + seed) % ncol

    blob = synthesize_gif_animated(width, height, n_frames, fn, pal)
    w, h, frames = decode_gif_frames(blob, every)
    assert (w, h) == (width, height)
    assert [fi for fi, _ in frames] == [f for f in range(n_frames) if f % every == 0]
    for fi, rgb in frames:
        want = bytes(
            c for y in range(height) for x in range(width) for c in pal[fn(x, y, fi)]
        )
        assert rgb == want


def test_wav_frame_features_reference():
    """k88's feature definitions against a hand model: windows are
    independent (no crossing counted over a window boundary), the last
    window may be short, and stereo clips featurize channel 0 only."""
    from marasa_spark.ops.multimodal import decode_wav_samples, synthesize_wav_pcm

    # interleave channel0 = [5, -3, 0, 4, -1, 2, 7], channel1 = noise
    c0 = [5, -3, 0, 4, -1, 2, 7]
    c1 = [9, 9, 9, 9, 9, 9, 9]
    flat = [v for pair in zip(c0, c1) for v in pair]
    blob = synthesize_wav_pcm(flat, 2, 8000, 16)
    ch, _r, _b, samples = decode_wav_samples(blob)
    mono = samples[::ch]
    assert mono == c0
    # window=3 → [5,-3,0], [4,-1,2], [7]
    # crossings: (5,-3) yes, (-3,0) no; (4,-1) yes, (-1,2) yes; none
    # boundary pairs (0,4) and (2,7) must NOT count
    win = 3
    got = []
    for w0 in range(0, len(mono), win):
        wv = mono[w0 : w0 + win]
        got.append(
            (
                len(wv),
                sum(abs(s) for s in wv),
                max(abs(s) for s in wv),
                sum(1 for a, b in zip(wv, wv[1:]) if (a < 0 < b) or (b < 0 < a)),
            )
        )
    assert got == [(3, 8, 5, 1), (3, 7, 4, 2), (1, 7, 7, 0)]


@settings(max_examples=30, deadline=None)
@given(
    bw=st.integers(1, 4),
    bh=st.integers(1, 4),
    crop_x=st.integers(0, 7),
    crop_y=st.integers(0, 7),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_color_block_constant_roundtrip_exact(bw, bh, crop_x, crop_y, seed):
    """k90's correctness core: block-constant (Y, Cb, Cr) color JPEGs
    decode their planes exactly through the interleaved multi-component
    scan (three DC predictors, luminance + chrominance Huffman pairs),
    and the RGB output equals the integer YCbCr conversion of the block
    constants — for any block grid and crop."""
    from marasa_spark.ops.jpeg import (
        decode_jpeg,
        synthesize_jpeg_color,
        ycbcr_to_rgb,
    )

    w = bw * 8 - crop_x
    h = bh * 8 - crop_y
    if w <= 0 or h <= 0:
        return

    def fn(bx: int, by: int):
        return (
            (seed + bx * 31 + by * 17) % 256,
            (seed // 3 + bx * 7 + by * 13) % 256,
            (seed // 7 + bx * 19 + by * 5) % 256,
        )

    blob = synthesize_jpeg_color(w, h, fn)
    W, H, ch, px = decode_jpeg(blob)
    assert (W, H, ch) == (w, h, 3)
    for y in range(h):
        for x in range(w):
            assert tuple(px[3 * (y * w + x) : 3 * (y * w + x) + 3]) == ycbcr_to_rgb(
                *fn(x // 8, y // 8)
            )


def test_jpeg_color_rejects_subsampling_and_gray_front_door():
    """Sampling-factor combinations OTHER than 4:4:4 and 4:2:0 (here
    4:2:2, Y at 2x1) are the declared external slot, and the grayscale
    front door refuses color payloads rather than silently returning one
    plane."""
    import pytest as _pytest

    from marasa_spark.ops.jpeg import (
        decode_jpeg_gray,
        synthesize_jpeg_color,
    )

    blob = synthesize_jpeg_color(16, 16, lambda bx, by: (10, 20, 30))
    # SOF0 layout: marker(2) len(2) precision(1) h(2) w(2) ncomp(1), then
    # (id, sampling, quant) triples — Y's sampling byte is at offset 11
    i = blob.index(b"\xff\xc0")
    assert blob[i + 11] == 0x11
    subsampled = blob[: i + 11] + b"\x21" + blob[i + 12 :]
    with _pytest.raises(NotImplementedError):
        from marasa_spark.ops.jpeg import decode_jpeg

        decode_jpeg(subsampled)
    with _pytest.raises(ValueError):
        decode_jpeg_gray(blob)


# ---------------------------------------------------------------------------
# JPEG reference codec: 4:2:0 chroma-subsampled color decode
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(
    mw=st.integers(1, 3),
    mh=st.integers(1, 3),
    crop_x=st.integers(0, 15),
    crop_y=st.integers(0, 15),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_420_mcu_constant_roundtrip_exact(mw, mh, crop_x, crop_y, seed):
    """k91's correctness core: an MCU-constant 4:2:0 image (four Y blocks
    + Cb + Cr per 16x16 MCU, all-ones quant) holds only DC coefficients,
    so encode -> interleaved entropy decode -> IDCT -> nearest-neighbor
    chroma upsample is EXACT for any MCU grid and any non-multiple-of-16
    crop."""
    import random as _random

    from marasa_spark.ops.jpeg import (
        decode_jpeg,
        synthesize_jpeg_color_420,
        ycbcr_to_rgb,
    )

    w = mw * 16 - crop_x
    h = mh * 16 - crop_y
    if w < 1 or h < 1:
        return
    rng = _random.Random(seed)
    colors = {
        (mx, my): (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for mx in range(mw)
        for my in range(mh)
    }
    blob = synthesize_jpeg_color_420(w, h, lambda mx, my: colors[(mx, my)])
    W, H, ch, px = decode_jpeg(blob)
    assert (W, H, ch) == (w, h, 3)
    for y in range(h):
        for x in range(w):
            exp = ycbcr_to_rgb(*colors[(x // 16, y // 16)])
            assert tuple(px[3 * (y * w + x) : 3 * (y * w + x) + 3]) == exp


def test_jpeg_codec_rejects_non_420_subsampling():
    """4:2:2 (Y 2x1) and other factor combinations stay the declared
    NotImplementedError slot — only 4:4:4 and 4:2:0 decode here."""
    import pytest as _pytest

    from marasa_spark.ops.jpeg import decode_jpeg, synthesize_jpeg_color_420

    blob = synthesize_jpeg_color_420(16, 16, lambda mx, my: (100, 110, 120))
    i = blob.index(b"\xff\xc0")
    # SOF0 component spec: len(2) prec(1) h(2) w(2) ncomp(1), then
    # (id, samp, tq) triples — Y's samp byte sits at body offset 7
    samp_off = i + 4 + 7
    assert blob[samp_off] == 0x22
    patched = blob[:samp_off] + bytes([0x21]) + blob[samp_off + 1 :]
    with _pytest.raises(NotImplementedError, match="4:2:2|external-codec"):
        decode_jpeg(patched)


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law expansion: exhaustive equality with the independent
# CPython audioop implementation, container round-trip, slot boundaries
# ---------------------------------------------------------------------------

def test_g711_expansion_matches_audioop_on_all_codes():
    """Both CCITT expansions agree with audioop (an independent C
    implementation of the same standard tables) on every one of the 256
    companded byte values — the correctness core under k92."""
    import struct
    import warnings

    import pytest

    # audioop left the stdlib in Python 3.13 — skip, don't error, on
    # newer interpreters (ADVICE r9); the 256-code table equality is
    # still pinned by the closed-form assertions in the k92 oracle.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        audioop = pytest.importorskip("audioop")

    from marasa_spark.ops.multimodal import (
        g711_alaw_to_linear,
        g711_ulaw_to_linear,
    )

    for b in range(256):
        assert (
            g711_ulaw_to_linear(b)
            == struct.unpack("<h", audioop.ulaw2lin(bytes([b]), 2))[0]
        )
        assert (
            g711_alaw_to_linear(b)
            == struct.unpack("<h", audioop.alaw2lin(bytes([b]), 2))[0]
        )


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 60),
    ch=st.integers(1, 2),
    law=st.sampled_from(["ulaw", "alaw"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_g711_container_roundtrip(n, ch, law, seed):
    """synthesize_wav_g711 -> decode_wav_samples expands exactly the
    companded byte sequence, frame-major, for both laws."""
    from marasa_spark.ops.multimodal import (
        decode_wav_samples,
        g711_alaw_to_linear,
        g711_ulaw_to_linear,
        synthesize_wav_g711,
    )

    codes = [(seed + 17 * i) % 256 for i in range(n * ch)]
    got_ch, rate, bits, samples = decode_wav_samples(
        synthesize_wav_g711(codes, ch, 8000, law)
    )
    fn = g711_ulaw_to_linear if law == "ulaw" else g711_alaw_to_linear
    assert (got_ch, rate, bits) == (ch, 8000, 8)
    assert samples == [fn(c) for c in codes]


def test_wav_decoder_slot_boundaries_after_g711():
    """IEEE-float (format 3) and 16-bit-G.711 stay NotImplementedError;
    the slot message now names only genuinely-external formats."""
    import struct

    import pytest as _pytest

    from marasa_spark.ops.multimodal import decode_wav_samples, synthesize_wav_g711

    good = synthesize_wav_g711([1, 2, 3, 4], 2, 8000, "ulaw")
    ieee_float = good[:20] + struct.pack("<H", 3) + good[22:]
    with _pytest.raises(NotImplementedError):
        decode_wav_samples(ieee_float)
    # G.711 with a nonsensical 16-bit sample width: rejected, not misread
    wide = good[:34] + struct.pack("<H", 16) + good[36:]
    with _pytest.raises(NotImplementedError):
        decode_wav_samples(wide)


# ---------------------------------------------------------------------------
# ISO-BMFF (MP4) container walk: round-trip, largesize, malformed payloads
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(
    ts=st.integers(1, 100000),
    dur=st.integers(0, 10**7),
    n_tracks=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_mp4_box_walk_roundtrip(ts, dur, n_tracks, seed):
    """synthesize_mp4 -> parse_mp4_boxes recovers brand, movie timing and
    the full track table for arbitrary track layouts (the correctness
    core under k93)."""
    from marasa_spark.ops.multimodal import parse_mp4_boxes, synthesize_mp4

    tracks = [
        (
            b"vide" if (seed + t) % 2 == 0 else b"soun",
            t + 1,
            1 + (seed * 7 + t * 31) % 90000,
            (seed * 13 + t * 17) % 500,
        )
        for t in range(n_tracks)
    ]
    m = parse_mp4_boxes(synthesize_mp4(b"mp42", ts, dur, tracks))
    assert (m["brand"], m["timescale"], m["duration"]) == ("mp42", ts, dur)
    got = [
        (t["handler"].encode(), t["track_id"], t["media_timescale"], t["n_samples"])
        for t in m["tracks"]
    ]
    assert got == tracks


def test_mp4_box_walk_largesize_and_malformed():
    """The 64-bit largesize header parses (size==1 escape), and truncated
    or out-of-bounds box structures raise ValueError rather than
    mis-walking."""
    import struct

    import pytest as _pytest

    from marasa_spark.ops.multimodal import parse_mp4_boxes, synthesize_mp4

    blob = synthesize_mp4(b"isom", 1000, 5000, [(b"vide", 1, 30000, 7)])
    # re-wrap the moov box with a largesize header: size=1 + 64-bit size
    ftyp_size = struct.unpack(">I", blob[:4])[0]
    moov = blob[ftyp_size:]
    large = (
        struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", len(moov) + 8)
        + moov[8:]
    )
    m = parse_mp4_boxes(blob[:ftyp_size] + large)
    assert m["duration"] == 5000 and m["tracks"][0]["n_samples"] == 7
    with _pytest.raises(ValueError):
        parse_mp4_boxes(blob[:10])  # truncated mid-header
    # box claiming to extend past the payload
    bad = struct.pack(">I", 10**6) + b"moov" + b"\x00" * 16
    with _pytest.raises(ValueError):
        parse_mp4_boxes(blob[:ftyp_size] + bad)
    with _pytest.raises(ValueError):
        parse_mp4_boxes(b"\x00" * 24)  # no ftyp/mvhd anywhere


def test_mp4_box_walk_version1_and_size_to_eof():
    """Version-1 tkhd/mdhd (64-bit create/modify times) store track_id /
    media timescale at offset 20, not the version-0 offset 12 — reading
    them at v0 offsets silently yields wrong values (ADVICE r9); and a
    size==0 final box legally extends to the end of the payload."""
    import struct

    from marasa_spark.ops.multimodal import parse_mp4_boxes

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 1)
        + struct.pack(">QQ", 0, 0)  # 64-bit ctime/mtime
        + struct.pack(">I", 600)  # timescale
        + struct.pack(">Q", 7200),  # 64-bit duration
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 1) + struct.pack(">QQ", 0, 0) + struct.pack(">I", 42),
    )
    mdhd = box(
        b"mdhd",
        struct.pack(">B3x", 1)
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 90000)
        + struct.pack(">Q", 0),
    )
    hdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"vide" + b"\x00" * 12)
    stsz = box(b"stsz", struct.pack(">III", 0, 0, 11))
    stbl = box(b"stbl", stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov_payload = mvhd + trak
    # moov as a size==0 box: extends to end of payload
    moov_to_eof = struct.pack(">I", 0) + b"moov" + moov_payload
    m = parse_mp4_boxes(ftyp + moov_to_eof)
    assert (m["timescale"], m["duration"]) == (600, 7200)
    t = m["tracks"][0]
    assert (t["track_id"], t["media_timescale"], t["handler"], t["n_samples"]) == (
        42,
        90000,
        "vide",
        11,
    )


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 12),
    mode=st.sampled_from(["24", "24td", "8"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_codec_roundtrip_identity(w, h, mode, seed):
    """BMP encoder and decoder are exact inverses (k95's correctness
    core): every row-padding residue (w % 4), both row orders (positive
    biHeight bottom-up, negative top-down), direct 24-bit BGR and 8-bit
    palette lookup."""
    from marasa_spark.ops.multimodal import decode_bmp_pixels, synthesize_bmp

    if mode == "8":
        palette = [
            ((seed + 7 * p) % 256, (3 * p + 1) % 256, (5 * p + 2) % 256)
            for p in range(16)
        ]
        indices = [(seed + 11 * j) % 16 for j in range(w * h)]
        blob = synthesize_bmp(w, h, [], bpp=8, palette=palette, indices=indices)
        want = [palette[i] for i in indices]
    else:
        want = [
            ((seed + j) % 256, (seed + 3 * j) % 256, (seed + 7 * j) % 256)
            for j in range(w * h)
        ]
        blob = synthesize_bmp(w, h, want, bpp=24, top_down=(mode == "24td"))
    got_w, got_h, got = decode_bmp_pixels(blob)
    assert (got_w, got_h) == (w, h)
    assert got == want


def test_bmp_codec_rejects_compressed_and_malformed():
    """The declared BMP boundary: RLE4/bitfield compression (and RLE8 at
    a non-8 bpp) raises NotImplementedError; malformed headers raise
    ValueError. (BI_RLE8 at 8 bpp is DECODED since round 11 — see the
    rle8 tests below.)"""
    import struct

    import pytest as _pytest

    from marasa_spark.ops.multimodal import decode_bmp_pixels, synthesize_bmp

    good = synthesize_bmp(3, 2, [(x, x, x) for x in range(6)], bpp=24)
    rle = good[:30] + struct.pack("<I", 1) + good[34:]  # BI_RLE8
    with _pytest.raises(NotImplementedError):
        decode_bmp_pixels(rle)
    with _pytest.raises(ValueError):
        decode_bmp_pixels(b"PNG" + good[3:])
    with _pytest.raises(ValueError):
        decode_bmp_pixels(good[:40])  # truncated header
    with _pytest.raises(ValueError):
        decode_bmp_pixels(good[:-3])  # truncated pixel rows
    # hostile biClrUsed (2^31 palette entries claimed): must raise fast
    # via the 256-entry clamp + palette bounds check, not spin
    pal8 = synthesize_bmp(
        2, 2, [], bpp=8,
        palette=[(p, p, p) for p in range(16)],
        indices=[0, 1, 2, 3],
    )
    hostile = pal8[:46] + struct.pack("<I", 2**31) + pal8[50:]
    with _pytest.raises(ValueError):
        decode_bmp_pixels(hostile[: 14 + 40 + 8])


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 12),
    runs=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_rle8_roundtrip_matches_uncompressed(w, h, runs, seed):
    """BI_RLE8 decode (k95 mode 3) is exact: the same indices encoded
    RLE8 and uncompressed must decode to identical pixels — across run-
    heavy and literal-heavy (absolute-mode) index patterns, every width
    residue, and palette sizes below 256."""
    from marasa_spark.ops.multimodal import decode_bmp_pixels, synthesize_bmp

    npal = 2 + seed % 200
    palette = [
        ((seed + 7 * p) % 256, (3 * p + 1) % 256, (5 * p + 2) % 256)
        for p in range(npal)
    ]
    if runs:  # repeat-heavy: encoded runs dominate
        indices = [(seed + j // 4) % npal for j in range(w * h)]
    else:  # churn-heavy: absolute-mode literals dominate
        indices = [(seed + 11 * j) % npal for j in range(w * h)]
    rle = synthesize_bmp(
        w, h, [], bpp=8, palette=palette, indices=indices, rle8=True
    )
    raw = synthesize_bmp(w, h, [], bpp=8, palette=palette, indices=indices)
    assert decode_bmp_pixels(rle) == decode_bmp_pixels(raw)


def test_bmp_rle8_delta_skip_and_early_eob():
    """The two opcodes a natural encoder rarely emits, hand-built: a
    delta escape skips the cursor (skipped pixels = palette index 0, the
    Windows fill convention) and an early end-of-bitmap leaves the rest
    of the image index 0."""
    import struct

    from marasa_spark.ops.multimodal import decode_bmp_pixels

    pal = [(10, 10, 10), (20, 20, 20), (30, 30, 30), (40, 40, 40)]
    palbytes = b"".join(bytes((b, g, r, 0)) for (r, g, b) in pal)

    def bmp(stream: bytes, w: int = 4, h: int = 3) -> bytes:
        offset = 14 + 40 + len(palbytes)
        fh = b"BM" + struct.pack("<IHHI", offset + len(stream), 0, 0, offset)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(stream), 0, 0, len(pal), 0
        )
        return fh + info + palbytes + stream

    # run 2×idx1 | delta(+1,+1) | run 1×idx2 | EOL | run 4×idx3 | EOB
    stream = bytes([2, 1, 0, 2, 1, 1, 1, 2, 0, 0, 4, 3, 0, 1])
    w, h, px = decode_bmp_pixels(bmp(stream))
    got = [[pal.index(p) for p in px[y * 4 : (y + 1) * 4]] for y in range(h)]
    # storage is bottom-up: image top row = last storage row
    assert got == [[3, 3, 3, 3], [0, 0, 0, 2], [1, 1, 0, 0]]

    # early EOB after one run: everything else is index 0
    w, h, px = decode_bmp_pixels(bmp(bytes([2, 1, 0, 1])))
    got = [[pal.index(p) for p in px[y * 4 : (y + 1) * 4]] for y in range(h)]
    assert got == [[0, 0, 0, 0], [0, 0, 0, 0], [1, 1, 0, 0]]


def test_bmp_rle8_hostile_streams_raise():
    """Hostile RLE8 rejections (the k95 fixture family's adversarial
    side): run/absolute/delta overflows, truncation mid-stream and
    mid-escape, palette index out of range, and the spec's top-down ban —
    all ValueError, never a silent partial decode or a spin."""
    import struct

    import pytest as _pytest

    from marasa_spark.ops.multimodal import decode_bmp_pixels

    pal = [(p, p, p) for p in range(4)]
    palbytes = b"".join(bytes((b, g, r, 0)) for (r, g, b) in pal)

    def bmp(stream: bytes, w: int = 4, h: int = 3, raw_h: int | None = None) -> bytes:
        offset = 14 + 40 + len(palbytes)
        fh = b"BM" + struct.pack("<IHHI", offset + len(stream), 0, 0, offset)
        info = struct.pack(
            "<IiiHHIIiiII",
            40, w, raw_h if raw_h is not None else h,
            1, 8, 1, len(stream), 0, 0, len(pal), 0,
        )
        return fh + info + palbytes + stream

    cases = [
        bytes([5, 1, 0, 1]),                   # run overflows the 4-wide row
        bytes([0, 5, 1, 2, 3, 4, 5, 0, 0, 1]), # absolute run overflows row
        bytes([2, 1]),                          # truncated: no EOB
        bytes([0, 2, 200]),                     # delta truncated mid-escape
        bytes([0, 2, 200, 0, 0, 1]),            # delta moves past the row
        bytes([0, 0, 0, 0, 0, 0, 0, 0, 2, 1, 0, 1]),  # EOLs past last row + run
        bytes([1, 200, 0, 1]),                  # palette index out of range
        bytes([0, 3, 1, 2, 3]),                 # absolute literals truncated (no pad)
    ]
    for stream in cases:
        with _pytest.raises(ValueError):
            decode_bmp_pixels(bmp(stream))
    # top-down + RLE8 is forbidden by the spec
    with _pytest.raises(ValueError):
        decode_bmp_pixels(bmp(bytes([2, 1, 0, 1]), raw_h=-3))


# -- histogram-selection exact percentiles (d8/d16 internals) ---------------

pct_values = st.lists(
    st.one_of(
        st.floats(
            min_value=-1e12, max_value=1e12,
            allow_nan=False, allow_infinity=False,
        ),
        # heavy-tie generator: a tiny alphabet forces duplicated values so
        # target lo/hi indices land inside one run of equal values
        st.sampled_from([0.0, -512.0, 511.999, 512.0, 1.5, 1.5, 1e6]),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(groups=st.lists(pct_values, min_size=1, max_size=3))
def test_histogram_percentiles_match_builtin_exactly(spark, groups):
    """d8's histogram selection must be bit-identical (pre-rounding) to the
    buffer-everything ``F.percentile`` aggregate it replaced — including
    negative values, bucket-boundary values, ties, and 1-element groups."""
    from marasa_spark.queries.aggregates import _D8_PS, d8_histogram_percentiles

    rows = [(f"g{gi}", v) for gi, vs in enumerate(groups) for v in vs]
    df = spark.createDataFrame(rows, "grp string, val double")

    ref = {
        r["grp"]: list(r["ps"])
        for r in df.groupBy("grp")
        .agg(
            F.percentile(
                F.col("val"), F.array(*[F.lit(p) for p, _ in _D8_PS])
            ).alias("ps")
        )
        .collect()
    }

    wide = d8_histogram_percentiles(df, "grp", "val")
    outs = [F.col("grp")]
    for p, nm in _D8_PS:
        pos = F.lit(p) * (F.col("n") - F.lit(1)).cast("double")
        lo_i = F.floor(pos).cast("long")
        hi_i = F.ceil(pos).cast("long")
        val = F.when(hi_i == lo_i, F.col(f"lo_{nm}")).otherwise(
            (hi_i.cast("double") - pos) * F.col(f"lo_{nm}")
            + (pos - lo_i.cast("double")) * F.col(f"hi_{nm}")
        )
        outs.append(val.alias(nm))
    got = {r["grp"]: [r[nm] for _, nm in _D8_PS] for r in wide.select(*outs).collect()}

    assert got == ref


def test_mp4_short_v1_box_body_raises_valueerror():
    """A v1 tkhd/mdhd whose body is shorter than the v1 field offsets must
    surface as the documented malformed-input ValueError, not a leaked
    struct.error (ADVICE r10)."""
    import struct

    import pytest

    from marasa_spark.ops.multimodal import parse_mp4_boxes

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    ftyp = box(b"ftyp", b"isom" + b"\x00" * 8)
    mvhd = box(b"mvhd", b"\x00" * 12 + struct.pack(">II", 1000, 5000) + b"\x00" * 80)
    short_v1_tkhd = box(b"tkhd", b"\x01" + b"\x00" * 10)  # body 11 < offset 20+4
    moov = box(b"moov", mvhd + box(b"trak", short_v1_tkhd))
    with pytest.raises(ValueError):
        parse_mp4_boxes(ftyp + moov)
