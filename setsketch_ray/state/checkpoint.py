"""Checkpoint / lineage layer: per-stage and per-partition resumable outputs.

north_rule: "Every stage checkpoints per-partition lineage and metrics so the
job resumes mid-shuffle".  Layout per stage:

    <root>/<stage>/
        part=<k>/*.parquet + _DONE       one directory per shuffle partition
        _MANIFEST.json                   lineage + per-partition metrics

The manifest records the stage's config hash, the input fingerprint, and one
entry per partition (row count).  ``write_parquet`` emits several files per
partition from concurrent tasks, so completeness is tracked with a per-
partition ``_DONE`` marker written only after the stage's write returns;
unmarked directories are crash debris and are deleted before recompute
(rewriting into them would duplicate rows).  Resume semantics:

* manifest present + fingerprints match  -> read, skip recompute entirely;
* partial output (crash mid-write)       -> unmarked partition dirs are
  discarded; only partitions without a ``_DONE`` marker are recomputed (the
  stage filters its input to those partition keys — for hash-partitioned
  shuffle stages this prunes the shuffle itself);
* config/input changed                   -> stage directory is replaced.

Everything is deterministic (counter-mode hashing end to end), so a resumed
run produces bit-identical output to an uninterrupted one — asserted in
``tests/test_checkpoint.py``.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa


def fingerprint_config(obj) -> str:
    """Stable hash of a (nested) config object for lineage manifests."""
    import hashlib

    def norm(o):
        if hasattr(o, "__dataclass_fields__"):
            return {f: norm(getattr(o, f)) for f in sorted(o.__dataclass_fields__)}
        if isinstance(o, (list, tuple)):
            return [norm(x) for x in o]
        if isinstance(o, dict):
            return {k: norm(v) for k, v in sorted(o.items())}
        return repr(o)

    return hashlib.sha256(json.dumps(norm(obj)).encode()).hexdigest()[:16]


def fingerprint_input(path_or_paths) -> str:
    """Input lineage fingerprint: file paths + sizes + mtimes."""
    import hashlib

    paths = [path_or_paths] if isinstance(path_or_paths, str) else list(path_or_paths)
    h = hashlib.sha256()
    for p in sorted(paths):
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                fp = os.path.join(p, f)
                st = os.stat(fp)
                h.update(f"{fp}:{st.st_size}:{int(st.st_mtime)}".encode())
        elif os.path.exists(p):
            st = os.stat(p)
            h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
        else:
            h.update(f"{p}:missing".encode())
    return h.hexdigest()[:16]


class StageCheckpoint:
    """One checkpointed, hash-partitioned stage output."""

    MANIFEST = "_MANIFEST.json"

    def __init__(self, root: str, stage: str, config_hash: str,
                 input_fingerprint: str, partition_col: str,
                 num_partitions: int):
        self.dir = os.path.join(root, stage)
        self.stage = stage
        self.config_hash = config_hash
        self.input_fingerprint = input_fingerprint
        self.partition_col = partition_col
        self.num_partitions = num_partitions

    # ------------------------------------------------------------- inspection
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, self.MANIFEST)

    def read_manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def is_complete(self) -> bool:
        m = self.read_manifest()
        return bool(m) and m["config_hash"] == self.config_hash \
            and m["input_fingerprint"] == self.input_fingerprint \
            and len(m["partitions"]) == self.num_partitions

    DONE = "_DONE"

    def _partition_dirs(self) -> dict[int, str]:
        if not os.path.isdir(self.dir):
            return {}
        out = {}
        for name in os.listdir(self.dir):
            if name.startswith(f"{self.partition_col}="):
                try:
                    out[int(name.split("=", 1)[1])] = \
                        os.path.join(self.dir, name)
                except ValueError:
                    pass
        return out

    def present_partitions(self) -> set[int]:
        """COMPLETE partition directories on disk (crash-surviving work).

        write_parquet writes several files per partition from concurrent
        tasks, so a bare directory does not prove completeness: only
        directories carrying the ``_DONE`` marker (written after the whole
        stage write succeeds) count.  Partially-written directories are
        removed before recompute (see :meth:`_clean_incomplete`) so a resume
        can neither lose rows nor duplicate them."""
        return {k for k, d in self._partition_dirs().items()
                if os.path.exists(os.path.join(d, self.DONE))}

    def _clean_incomplete(self) -> None:
        """Remove partition dirs without a completion marker (crash debris);
        rewriting into them would otherwise duplicate their rows.  Also
        drops ``*.__tmp__`` staging dirs left by a kill inside a
        per-partition writer task."""
        for k, d in self._partition_dirs().items():
            if not os.path.exists(os.path.join(d, self.DONE)):
                shutil.rmtree(d)
        if os.path.isdir(self.dir):
            for name in os.listdir(self.dir):
                if name.endswith(".__tmp__"):
                    shutil.rmtree(os.path.join(self.dir, name),
                                  ignore_errors=True)

    def _mark_partitions_done(self) -> None:
        for _k, d in self._partition_dirs().items():
            marker = os.path.join(d, self.DONE)
            if not os.path.exists(marker):
                with open(marker, "w"):
                    pass

    def missing_partitions(self) -> list[int]:
        if self.is_complete():
            return []
        present = self.present_partitions()
        return [k for k in range(self.num_partitions) if k not in present]

    # -------------------------------------------------------------- execution
    def write_partitions(self, ds) -> None:
        """Write the dataset's rows (already restricted to the missing
        partitions) under part=<k>/ directories + refresh the manifest.

        Each partition commits ATOMICALLY and INDEPENDENTLY: one writer
        task per partition stages into ``part=<k>.__tmp__`` (file + _DONE
        marker) and renames into place, so a kill mid-stage preserves every
        partition that finished — the resume recomputes only the rest
        (true per-partition lineage, not stage-at-a-time).  The layout
        matches hive ``write_parquet(partition_cols=...)`` exactly (the
        partition column lives in the directory name, not the file), so
        :meth:`read` is unchanged.  Cost: one hash exchange by the
        partition column — the price of the atomic commit unit."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.dir, exist_ok=True)
        part_col, stage_dir, done = self.partition_col, self.dir, self.DONE

        def write_one(t: "pa.Table") -> "pa.Table":
            if t.num_rows == 0:
                return pa.table({"k": pa.array([], pa.int64())})
            k = int(t[part_col][0].as_py())
            pdir = os.path.join(stage_dir, f"{part_col}={k}")
            tmp = pdir + ".__tmp__"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(pdir, ignore_errors=True)
            os.makedirs(tmp)
            pq.write_table(t.drop_columns([part_col]).combine_chunks(),
                           os.path.join(tmp, "part-00000.parquet"))
            with open(os.path.join(tmp, done), "w"):
                pass
            os.rename(tmp, pdir)
            return pa.table({"k": pa.array([k], pa.int64())})

        ds.groupby(part_col).map_groups(
            write_one, batch_format="pyarrow").materialize()
        self._write_manifest()

    def _write_manifest(self) -> None:
        import pyarrow.parquet as pq

        partitions = {}
        for k in sorted(self.present_partitions()):
            pdir = os.path.join(self.dir, f"{self.partition_col}={k}")
            rows = 0
            nbytes = 0
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    fp = os.path.join(pdir, f)
                    rows += pq.read_metadata(fp).num_rows
                    nbytes += os.path.getsize(fp)
            partitions[str(k)] = {"rows": rows, "bytes": nbytes}
        manifest = {
            "stage": self.stage,
            "config_hash": self.config_hash,
            "input_fingerprint": self.input_fingerprint,
            "num_partitions": self.num_partitions,
            "partitions": partitions,
        }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())

    def invalidate(self) -> None:
        if os.path.isdir(self.dir):
            shutil.rmtree(self.dir)

    def read(self):
        import ray.data as rd

        return rd.read_parquet(self.dir)

    def run(self, compute_fn):
        """Materialize this stage resumably.

        ``compute_fn(missing: list[int] | None)`` must return the stage's
        dataset — restricted to the given partition keys when a list is
        passed (None = all).  Returns a Dataset reading the completed output.
        """
        m = self.read_manifest()
        if m and (m["config_hash"] != self.config_hash
                  or m["input_fingerprint"] != self.input_fingerprint):
            self.invalidate()  # lineage changed -> full recompute
        if self.is_complete():
            return self.read()
        self._clean_incomplete()
        missing = self.missing_partitions()
        full = len(missing) == self.num_partitions
        ds = compute_fn(None if full else missing)
        self.write_partitions(ds)
        if not self.is_complete():
            # partitions with zero rows produce no directory; write empty
            # marked directories so completeness is well-defined
            for k in self.missing_partitions():
                os.makedirs(os.path.join(self.dir,
                                         f"{self.partition_col}={k}"),
                            exist_ok=True)
            self._mark_partitions_done()
            self._write_manifest()
        return self.read()
