"""CLI entrypoint tests: the `ray job submit` driver script
(setsketch_ray/cli.py) — gen-images then a checkpointed near-dup job with
metrics, plus the resume-on-resubmit property (north_rule: "run via ray job
submit ... resumable from checkpoint")."""

import json
import os
import time

import pytest

from setsketch_ray.cli import main
from setsketch_ray.pipelines.dedup import evaluate_recall
from setsketch_ray.sources import truth_pairs

N = 600


@pytest.fixture(scope="module")
def cli_env(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    src = str(root / "imgs.parquet")
    out = str(root / "dedup_out")
    rc = main(["gen-images", "--out", src, "--n", str(N), "--size", "32"])
    assert rc == 0
    return src, out


def test_gen_images_then_near_dup_job(cli_env, capsys):
    src, out = cli_env
    rc = main(["near-dup", "--input", src, "--output", out,
               "--num-partitions", "8", "--registers", "0"])
    assert rc == 0
    metrics = json.loads(open(os.path.join(out, "_METRICS.json")).read())
    assert metrics["n_rows_clustered"] == N
    assert metrics["n_dup_edges"] > 0
    assert metrics["resumable"] is True
    # stage checkpoints + per-partition manifests exist
    for stage in ("sketched", "pairs", "edges", "clusters"):
        assert os.path.exists(os.path.join(out, stage, "_MANIFEST.json"))
    # the job's cluster output achieves the recall bar on planted truth
    import pyarrow.dataset as pads

    # transitive_pairs pairs the dict KEYS grouped by root, so keep every row
    # (roots map to themselves; singletons form size-1 groups -> no pairs)
    t = pads.dataset(os.path.join(out, "clusters")).to_table()
    mapping = dict(zip(t["image_id"].to_pylist(), t["cluster_id"].to_pylist()))
    rec = evaluate_recall(mapping, truth_pairs(N))
    assert rec["recall"] >= 0.99


def test_resubmit_resumes_from_checkpoint(cli_env):
    src, out = cli_env
    t0 = time.time()
    rc = main(["near-dup", "--input", src, "--output", out,
               "--num-partitions", "8", "--registers", "0"])
    resumed_wall = time.time() - t0
    assert rc == 0
    first = json.loads(open(os.path.join(out, "_METRICS.json")).read())
    # all partitions present -> nothing recomputed; edges identical
    assert first["n_dup_edges"] > 0
    assert resumed_wall < 30  # resume skips decode+sketch+pairs entirely


def test_cli_validate_and_diff(ray_session, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    a = pa.table({"id": [1, 2, 3, 4], "v": [10, 20, 99, 40]})
    b = pa.table({"id": [2, 3, 4, 5], "v": [20, 31, 40, 50]})
    ref = pa.table({"rid": [1, 2, 3]})
    pa_dir = tmp_path
    pq.write_table(a, str(pa_dir / "a.parquet"))
    pq.write_table(b, str(pa_dir / "b.parquet"))
    pq.write_table(ref, str(pa_dir / "ref.parquet"))

    rc = main(["validate", "--input", str(pa_dir / "a.parquet"),
               "--rules", json.dumps([["not_null", "id"],
                                      ["range", "v", 0, 50],
                                      ["unique", ["id"]],
                                      ["fk", "id", "r", "rid"]]),
               "--ref", f"r={pa_dir / 'ref.parquet'}",
               "--exit-code", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rows = {(r["rule"], r["col"]): r for r in out}
    assert rows[("range", "v")]["n_violations"] == 1          # 99
    assert rows[("fk", "id->r.rid")]["n_violations"] == 1     # id 4
    assert rows[("unique", "id")]["n_violations"] == 0
    assert rc == 3                                            # failing rules

    rc = main(["diff", "--a", str(pa_dir / "a.parquet"),
               "--b", str(pa_dir / "b.parquet"),
               "--key", "id", "--columns", "v"])
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts == {"added": 1, "changed": 1, "removed": 1,
                      "unchanged": 2}


def test_cli_convert_roundtrips(ray_session, tmp_path, capsys):
    """convert: jsonl -> sqlite -> parquet chain preserves rows; wds sink
    writes tar shards readable by read_corpus."""
    import json

    import pyarrow as pa

    from setsketch_ray.cli import main
    from setsketch_ray.sources.readers import read_corpus

    src = tmp_path / "docs.jsonl"
    with open(src, "w") as f:
        for i in range(40):
            f.write(json.dumps({"doc_id": i, "text": f"body {i}"}) + "\n")

    sq = str(tmp_path / "sq")
    assert main(["convert", "--input", str(src), "--output", sq,
                 "--format", "sqlite", "--num-shards", "3"]) == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sum(r["n_rows"] for r in manifest) == 40

    pq_dir = str(tmp_path / "pq")
    assert main(["convert", "--input", sq, "--output", pq_dir,
                 "--format", "parquet"]) == 0
    capsys.readouterr()
    got = pa.concat_tables(list(read_corpus(pq_dir).iter_batches(
        batch_format="pyarrow", batch_size=1 << 20))).sort_by("doc_id")
    assert got["doc_id"].to_pylist() == list(range(40))
    assert got["text"].to_pylist() == [f"body {i}" for i in range(40)]

    wds = str(tmp_path / "wds")
    assert main(["convert", "--input", str(src), "--output", wds,
                 "--format", "wds", "--num-shards", "2"]) == 0
    capsys.readouterr()
    back = pa.concat_tables(list(read_corpus(wds).iter_batches(
        batch_format="pyarrow", batch_size=1 << 20)))
    assert back.num_rows == 40 and "text" in back.column_names

    jz = str(tmp_path / "jz")
    assert main(["convert", "--input", pq_dir, "--output", jz,
                 "--format", "jsonl", "--num-shards", "2"]) == 0
    capsys.readouterr()
    jzt = pa.concat_tables(list(read_corpus(jz).iter_batches(
        batch_format="pyarrow", batch_size=1 << 20))).sort_by("doc_id")
    assert jzt["text"].to_pylist() == [f"body {i}" for i in range(40)]


def test_cli_stats(ray_session, tmp_path, capsys):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from setsketch_ray.cli import main

    t = pa.table({"id": pa.array([1, 2, 2, None], pa.int64()),
                  "s": pa.array(["a", "b", "b", "b"], pa.string()),
                  "f": pa.array([0.5, 1.0, 1.5, 2.0], pa.float64())})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    assert main(["stats", "--input", p]) == 0
    rows = {r["column"]: r for r in json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])}
    assert set(rows) == {"id", "s"}  # float column auto-excluded
    assert rows["id"]["n"] == 4 and rows["id"]["n_null"] == 1
    assert rows["id"]["n_distinct"] == 2
    assert rows["s"]["n_distinct"] == 2 and rows["s"]["min_str"] == "a"
