"""near_dup_audio (pipelines/audiodedup.py): exact pair-set equality on
the planted corpus, fingerprint stability across codecs, corpus
separability invariants."""
import numpy as np
import pyarrow as pa


def test_near_dup_audio_exact_pairs(ray_session):
    from setsketch_ray.pipelines.audiodedup import near_dup_audio
    from setsketch_ray.sources.av import (audio_dedup_dataset,
                                          truth_audio_pairs)

    n = 128
    pairs = near_dup_audio(audio_dedup_dataset(n, parallelism=4)).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    tp = truth_audio_pairs(n)
    ts = set(zip(tp["id_a"].to_pylist(), tp["id_b"].to_pylist()))
    assert len(ts) >= 10  # the corpus plants real clusters at this n
    assert got == ts
    # scores are high-confidence, not boundary-riding
    assert min(r["cosine_milli"] for r in pairs) >= 960


def test_audio_fingerprint_stability_across_codecs(ray_session):
    """The same waveform re-encoded through every codec keeps its peak
    within 0.1 Hz and its sparse-spectrum cosine >= 0.99 vs PCM16."""
    import ray.data as rd

    from setsketch_ray.pipelines.audiodedup import (_fingerprint,
                                                    _sparse_cosine,
                                                    decode_audio_any)
    from setsketch_ray.sources.av import _AUDIO_ENC, _tone_signal

    sig = _tone_signal(0xDEADBEEF12345678)
    ref = None
    for fmt, enc in _AUDIO_ENC.items():
        dsig, rate = decode_audio_any(enc(sig, 8000))
        f1, b, m = _fingerprint(dsig, rate)
        if ref is None:
            ref = (f1, b, m)
        assert abs(f1 - ref[0]) < 0.1, fmt
        assert _sparse_cosine(b, m, ref[1], ref[2]) > 0.99, fmt


def test_audio_dedup_corpus_separability():
    """Construction invariant: no cross-cluster clip pair within 4 Hz on
    both tones (the verify threshold rests on this margin)."""
    from setsketch_ray.sources.av import _audio_role

    n, seed = 192, 42
    seen = {}
    for i in range(n):
        bk, _var, cl = _audio_role(seed, i)
        f1 = 150.0 + (bk % 1800)
        f2 = 150.0 + ((bk >> 16) % 1800)
        seen[i] = (min(f1, f2), max(f1, f2), cl if cl >= 0 else -1 - i)
    ks = list(seen.values())
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            if ks[i][2] == ks[j][2]:
                continue
            d = max(abs(ks[i][0] - ks[j][0]), abs(ks[i][1] - ks[j][1]))
            assert d > 4.0, (i, j, d)


def test_near_dup_audio_hash_join_parity(ray_session):
    """join_strategy='hash' (lookup_join co-partition attach) is
    bit-identical to the broadcast pool path."""
    from setsketch_ray.pipelines.audiodedup import near_dup_audio
    from setsketch_ray.sources.av import audio_dedup_dataset

    n = 96
    def run(strategy):
        out = near_dup_audio(audio_dedup_dataset(n, parallelism=4),
                             join_strategy=strategy).take_all()
        return sorted((r["id_a"], r["id_b"], r["cosine_milli"])
                      for r in out)

    a, b = run("broadcast"), run("hash")
    assert a == b and len(a) > 0
