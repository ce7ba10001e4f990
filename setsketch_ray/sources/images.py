"""Deterministic synthetic image+caption table with planted near-duplicates.

Schema exactly per BASELINE.json input_hint:
``(image_id: string, bytes: binary, w: int32, h: int32, fmt: string,
caption: string, phash: int64)`` — plus a sidecar ``truth_pairs`` table
(``id_a, id_b, cluster_id``) listing all intra-cluster pairs, the ground
truth for dup-pair recall (>= 0.99 target, BASELINE.json north_rule).

Everything is a pure function of ``(seed, row_index)`` (FIXTURES.md F1), so
any partition regenerates independently — the generator itself runs as a Ray
``map_batches`` over ``ray.data.range(n)`` for large scales.

Cluster layout: consecutive index blocks of size ``_BLOCK``; block b hosts a
near-dup cluster of size s(b) ∈ {1..4} (s >= 2 with ~35 % probability);
members beyond s are singletons.  Cluster members derive from one seed image
via real near-dup edits: lossy re-encode (quality 95/90), ±1 px roll,
brightness shift, caption paraphrase (>= 80 % shared shingles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketchlib.hashing import mix2, mix64
from .codec import encode_image, phash64, phash_to_int64, decode_image

_BLOCK = 8

_ADJECTIVES = ("red blue green golden small large ancient modern quiet bright "
               "rustic shiny wooden metal striped plain cozy giant tiny vivid "
               "amber crimson teal ivory dusty gleaming crooked narrow wide "
               "lonely busy silent misty frozen sunny weathered ornate humble "
               "grand pale dark mossy painted carved broken curved slanted "
               "smooth rough marble brick granite velvet faded").split()
_NOUNS = ("dog cat bridge mountain river city tree boat house bird car train "
          "garden tower window market castle forest beach island lantern "
          "harbor temple library museum fountain statue plaza alley rooftop "
          "balcony staircase archway chapel mill barn lighthouse pier canal "
          "orchard vineyard meadow cliff valley dune glacier waterfall cave "
          "monastery pavilion gazebo courtyard").split()
_VERBS = ("stands rests appears shines waits sits glows drifts looms rises "
          "sleeps hides leans towers sprawls nestles perches floats stretches "
          "crumbles gleams shimmers endures beckons").split()
_PLACES = ("paris kyoto oslo cairo lima quito dublin vienna prague lisbon "
           "madrid athens bergen porto seville naples krakow zagreb riga "
           "tallinn vilnius bruges ghent basel lucerne salzburg graz turin "
           "bologna valencia marseille lyon nantes bordeaux").split()
_TIMES = ("dawn dusk noon midnight springtime autumn winter summer twilight "
          "sunrise sunset evening morning daybreak nightfall harvest").split()

# paraphrase synonym map (keeps most shingles intact: one-word substitutions)
_SYNONYM = {"small": "little", "large": "big", "quiet": "calm",
            "bright": "luminous", "stands": "stood", "rests": "rested",
            "shines": "shone", "waits": "waited"}


def _u(seed: int, idx, tag: int) -> np.ndarray:
    return mix2(mix2(np.asarray(idx, dtype=np.uint64), seed), tag)


def _cluster_size(seed: int, block: int) -> int:
    h = int(_u(seed, block, 101))
    r = h % 100
    if r < 65:
        return 1
    return 2 + (h // 100) % 3  # 2..4


def _row_role(seed: int, idx: int):
    """-> (base_key, variant, cluster_id or -1)."""
    block = idx // _BLOCK
    pos = idx % _BLOCK
    s = _cluster_size(seed, block)
    if s >= 2 and pos < s:
        base_key = int(_u(seed, block, 202)[()])
        return base_key, pos, block
    base_key = int(_u(seed, idx, 303)[()])
    return base_key, 0, -1


def _synth_pixels(base_key: int, size: int) -> np.ndarray:
    """Blocky low-frequency noise + rectangles; deterministic per key."""
    rng = np.random.Generator(np.random.PCG64(base_key & 0x7FFFFFFFFFFFFFFF))
    cell = max(size // 8, 1)
    low = rng.integers(0, 256, (size // cell, size // cell, 3))
    img = np.kron(low, np.ones((cell, cell, 1)))
    for _ in range(3):
        y0, x0 = rng.integers(0, size - 4, 2)
        hgt, wid = rng.integers(3, size // 2, 2)
        img[y0:min(y0 + hgt, size), x0:min(x0 + wid, size)] = rng.integers(0, 256, 3)
    img = img + rng.integers(-6, 7, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _caption(base_key: int) -> str:
    h = np.uint64(base_key)

    def pick(words, tag):
        return words[int(mix2(h, tag)[()]) % len(words)]

    return (f"a {pick(_ADJECTIVES, 1)} {pick(_NOUNS, 2)} {pick(_VERBS, 3)} near "
            f"the {pick(_ADJECTIVES, 4)} {pick(_NOUNS, 5)} in {pick(_PLACES, 6)} "
            f"during {pick(_TIMES, 7)}")


def _paraphrase(caption: str, variant: int) -> str:
    """One-word synonym swap (FIXTURES.md F1: paraphrases keep >= 80 % of
    word-level shingles)."""
    if variant == 0:
        return caption
    words = caption.split()
    changed = 0
    for i, w in enumerate(words):
        if w in _SYNONYM and changed < 1:
            words[i] = _SYNONYM[w]
            changed += 1
    return " ".join(words)


def _apply_variant(pixels: np.ndarray, variant: int, fmt_profile: str = "mixed"):
    """Near-dup edit + output format. Returns (pixels, fmt, quality).

    ``fmt_profile="mixed"`` is the light-decode default (png + LJP1);
    ``fmt_profile="jpeg"`` stores every row as real baseline JPEG (T.81,
    ``sources/jpeg.py``) — the decode-dominated profile of an actual web
    corpus, used by ``bench.py --scaling`` for the compute-bound scaling
    measurement (JPEG decode is ~30x the arithmetic of LJP1 per row, so the
    map stage is cpu-bound, not DRAM-bound, at high core counts)."""
    if fmt_profile in ("jpeg", "jpeg_prog"):
        # "jpeg_prog": variant 1 is stored PROGRESSIVE (SOF2) — a realistic
        # web-corpus mix where ~1/4 of files take the multi-scan decode path
        fmt1 = "pjpg" if fmt_profile == "jpeg_prog" else "jpg"
        if variant == 0:
            return pixels, "jpg", 95
        if variant == 1:
            return pixels, fmt1, 90  # lossy re-encode near-dup
        if variant == 2:
            return np.roll(pixels, 1, axis=1), "jpg", 95
        return (np.clip(pixels.astype(np.int16) + 3, 0, 255).astype(np.uint8),
                "jpg", 95)
    if fmt_profile == "webp":
        # every row real VP8L WebP (sources/webp.py): near-dup semantics
        # identical to the mixed profile (webp lossless == png lossless,
        # LJP1 stays the lossy re-encode edit)
        if variant == 0:
            return pixels, "webp", 0
        if variant == 1:
            return pixels, "ljpg", 95
        if variant == 2:
            return np.roll(pixels, 1, axis=1), "webp", 0
        return (np.clip(pixels.astype(np.int16) + 3, 0, 255)
                .astype(np.uint8), "webp", 0)
    if variant == 0:
        return pixels, "png", 0
    if variant == 1:
        return pixels, "ljpg", 95
    if variant == 2:
        return np.roll(pixels, 1, axis=1), "ljpg", 95
    # variant 3: small brightness shift, lossless
    return np.clip(pixels.astype(np.int16) + 3, 0, 255).astype(np.uint8), "png", 0


def generate_rows(indices: np.ndarray, seed: int = 42, size: int = 32,
                  fmt_profile: str = "mixed") -> pa.Table:
    """Pure batch generator: row ``i`` of the corpus for each i in indices."""
    ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    for idx in np.asarray(indices, dtype=np.int64):
        idx = int(idx)
        base_key, variant, _cluster = _row_role(seed, idx)
        pixels = _synth_pixels(base_key, size)
        pixels, fmt, quality = _apply_variant(pixels, variant, fmt_profile)
        data = encode_image(pixels, fmt, quality)
        # phash from the *decoded stored bytes* so the column is consistent
        # with what a decode stage would recompute
        decoded = decode_image(data, fmt)
        ids.append(f"img{idx:012d}")
        blobs.append(data)
        ws.append(pixels.shape[1])
        hs.append(pixels.shape[0])
        fmts.append(fmt)
        captions.append(_paraphrase(_caption(base_key), variant))
        phashes.append(phash_to_int64(phash64(decoded)))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(captions, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    })


def truth_pairs(n_rows: int, seed: int = 42) -> pa.Table:
    """All intra-cluster (id_a < id_b) pairs — analytic, no image synthesis."""
    id_a, id_b, cid = [], [], []
    for block in range((n_rows + _BLOCK - 1) // _BLOCK):
        s = _cluster_size(seed, block)
        if s < 2:
            continue
        members = [block * _BLOCK + p for p in range(s) if block * _BLOCK + p < n_rows]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                id_a.append(f"img{members[i]:012d}")
                id_b.append(f"img{members[j]:012d}")
                cid.append(block)
    return pa.table({
        "id_a": pa.array(id_a, pa.string()),
        "id_b": pa.array(id_b, pa.string()),
        "cluster_id": pa.array(cid, pa.int64()),
    })


def images_table(n_rows: int, seed: int = 42, size: int = 32,
                 fmt_profile: str = "mixed") -> pa.Table:
    """Driver-side generation (small scales / tests)."""
    return generate_rows(np.arange(n_rows), seed, size, fmt_profile)


class GenerateImagesBatch:
    """Ray ``map_batches`` callable over ``ray.data.range(n)`` for distributed
    generation: each task generates only its own index range (pure function of
    (seed, index), FIXTURES.md F1)."""

    def __init__(self, seed: int = 42, size: int = 32,
                 fmt_profile: str = "mixed"):
        self.seed = seed
        self.size = size
        self.fmt_profile = fmt_profile

    def __call__(self, batch: pa.Table) -> pa.Table:
        return generate_rows(batch["id"].to_numpy(), self.seed, self.size,
                             self.fmt_profile)


def images_dataset(n_rows: int, seed: int = 42, size: int = 32,
                   parallelism: int = 32, fmt_profile: str = "mixed"):
    """Distributed generation as a Ray Dataset."""
    import ray.data as rd

    # batch_size=None keeps one batch per input block: a fixed batch_size
    # BUNDLES small blocks (n_rows/parallelism rows each) into fewer output
    # blocks, silently collapsing downstream parallelism (a 4000-row corpus
    # at parallelism=16 wrote only 4 parquet files)
    return rd.range(n_rows, override_num_blocks=parallelism).map_batches(
        GenerateImagesBatch(seed, size, fmt_profile), batch_format="pyarrow",
        batch_size=None)


def cached_images_parquet(n_rows: int, seed: int = 42, size: int = 32,
                          root: str = "/tmp/setsketch_fixtures") -> str:
    """Generate-once parquet fixture path (tests/bench reuse)."""
    import os

    path = os.path.join(root, f"images_v2_n{n_rows}_s{seed}_sz{size}.parquet")
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        import pyarrow.parquet as pq

        tmp = path + ".tmp"
        pq.write_table(images_table(n_rows, seed, size), tmp)
        os.replace(tmp, path)
    return path
