"""Property-based round-trips for the pure-stdlib media codecs: for
arbitrary dimensions, layouts, palettes and sample values, decode must
exactly invert encode.  Random inputs reach corners the formula-based
oracle corpora never do (1-pixel images, saturated values, single-frame
and many-frame animations, odd PCM lengths)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quick_stream_spark.functions.gif import decode_gif, encode_gif
from quick_stream_spark.functions.png import decode_png, encode_png
from quick_stream_spark.functions.wav import decode_wav, encode_wav

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    color_type=st.sampled_from([0, 2, 4, 6]),
    filter_type=st.integers(0, 4),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_any_layout(w, h, color_type, filter_type, seed):
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]

    def px(x, y):
        return tuple((seed + x * 31 + y * 17 + c * 7) % 256 for c in range(ch))

    info = decode_png(encode_png(w, h, px, filter_type=filter_type, color_type=color_type))
    assert (info["width"], info["height"], info["channels"]) == (w, h, ch)
    want = [0] * ch
    for y in range(h):
        for x in range(w):
            p = px(x, y)
            for c in range(ch):
                want[c] += p[c]
    assert info["channel_sums"] == want


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 8),
    n_frames=st.integers(1, 5),
    depth=st.sampled_from([2, 4, 16, 64]),
    seed=st.integers(0, 2**31),
)
def test_gif_roundtrip_any_animation(w, h, n_frames, depth, seed):
    pal = [((i * 37 + seed) % 256, (i * 11) % 256, (i * 5) % 256) for i in range(depth)]
    frames = [
        [(seed + x + y * 3 + f * 5) % depth for y in range(h) for x in range(w)]
        for f in range(n_frames)
    ]
    info = decode_gif(encode_gif(w, h, frames, pal))
    assert (info["width"], info["height"], info["n_frames"]) == (w, h, n_frames)
    assert info["frame_index_sums"] == [sum(fr) for fr in frames]


@settings(**_SETTINGS)
@given(
    n=st.integers(1, 400),
    channels=st.integers(1, 3),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_any_pcm(n, channels, sr, seed):
    samples = [
        tuple(((seed + i * 7 + c * 13) % 65536) - 32768 for c in range(channels))
        for i in range(n)
    ]
    info = decode_wav(encode_wav(samples, sr, channels))
    assert (info["sample_rate"], info["channels"], info["n_samples"]) == (sr, channels, n)
    for c in range(channels):
        assert info["channel_sums"][c] == sum(s[c] for s in samples)
        assert info["channel_sumsq"][c] == sum(s[c] * s[c] for s in samples)
    assert info["duration_ms"] == n * 1000 // sr


def test_substring_spans_match_independent_python_reference(spark):
    """dedup_substring_spans and its oracle share the same rolling-hash
    construction; this reference implementation shares NOTHING with it
    (dict counting + brute interval merge in Python), so a bug in the
    shared construction cannot hide."""
    import hashlib
    from collections import Counter

    from quick_stream_spark.plans.text import (
        SUBSTR_W,
        _SUBSTR_B,
        _SUBSTR_P,
        _dup_corpus,
        dedup_substring_spans,
    )
    from tests.conftest import SF_SMOKE

    # the window hash is shared by construction (the algorithm IS
    # hash-bucketing); what this reference keeps independent is the
    # counting + span-merge logic.  P ~ 1e12 makes cross-window
    # collisions negligible, so sharing the hash no longer hides them.
    P, B = _SUBSTR_P, _SUBSTR_B
    docs = {r.id: (r.text or "") for r in _dup_corpus(spark, SF_SMOKE).collect()}
    grams = {}
    counts = Counter()
    for did, text in docs.items():
        toks = text.split()
        th = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % P for t in toks]
        if len(th) < SUBSTR_W:
            continue
        gs = []
        for i in range(len(th) - SUBSTR_W + 1):
            g = th[i]
            for j in range(1, SUBSTR_W):
                g = (g * B + th[i + j]) % P
            gs.append(g)
            counts[g] += 1
        grams[did] = (len(th), gs)
    expected = {}
    for did, (n_tokens, gs) in grams.items():
        hits = [i for i, g in enumerate(gs) if counts[g] >= 2]
        if not hits:
            continue
        spans = []
        start = prev_end = None
        for pos in hits:
            if prev_end is None or pos > prev_end:
                if start is not None:
                    spans.append((start, prev_end))
                start = pos
            prev_end = max(prev_end or 0, pos + SUBSTR_W)
        spans.append((start, prev_end))
        dup_tokens = sum(e - s for s, e in spans)
        expected[did] = (n_tokens, len(spans), dup_tokens)
    got = {
        r.id: (r.n_tokens, r.n_dup_spans, r.dup_tokens)
        for r in dedup_substring_spans(spark, SF_SMOKE).collect()
    }
    assert got == expected
