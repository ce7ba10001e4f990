"""Semi-structured (JSON) column extraction, vectorized.

Large-scale event/telemetry corpora carry per-row JSON payload columns
(``events.props`` here); the extraction step that turns them into typed
columns must not be a per-row ``json.loads`` loop.  ``json_extract`` runs
one RE2 ``pc.extract_regex`` pass per requested key over the whole batch
(the JSON scalar grammar for ``"key": <value>`` is regular), and falls back
to stdlib ``json.loads`` ONLY for the rows the regex cannot serve — strings
containing backslash escapes or non-scalar (object/array) values — detected
vectorized via a quoted-key substring probe.  On flat telemetry payloads the
fallback handles zero rows.

Semantics mirror DuckDB's ``json_extract_string(col, '$.key')``: missing
key -> null, JSON ``null`` -> null, numbers/booleans -> their literal text,
strings -> unquoted/unescaped text.  (Reference repo has no JSON surface;
this is part of the beyond-reference large-pipeline family.)
"""
from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# one regex per JSON scalar form (pc.extract_regex returns "" — not null —
# for non-participating alternation groups, so alternatives can't share one
# pattern).  RE2-compatible (no lookarounds).  `_STR_PAT` = quoted string
# WITHOUT escapes (the fast path); `_RAW_PAT` = number / true / false / null.
_STR_PAT = r'"{key}"\s*:\s*"(?P<v>[^"\\]*)"'
_RAW_PAT = (r'"{key}"\s*:\s*'
            r'(?P<v>-?[0-9][0-9]*(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?'
            r'|true|false|null)')


def _extract_one(col: pa.ChunkedArray | pa.Array, key: str) -> pa.Array:
    """Extract one key from a flat-JSON string array -> string array."""
    esc = re.escape(key)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.struct_field(pc.extract_regex(col, _STR_PAT.format(key=esc)), "v")
    raw = pc.struct_field(pc.extract_regex(col, _RAW_PAT.format(key=esc)), "v")
    # JSON null -> SQL null; otherwise the raw token text
    r = pc.if_else(pc.equal(raw, "null"), pa.nulls(len(col), pa.string()), raw)
    out = pc.coalesce(s, r)
    # fallback rows (full json.loads re-parse, overwriting the fast path):
    # the quoted key is present AND either both regexes missed (nested
    # object/array value, exotic whitespace) or the row contains a backslash
    # (escaped string values — where the raw regex could also false-positive
    # on a `\"key\": n` sequence embedded INSIDE another key's string value).
    has_key = pc.fill_null(pc.match_substring(col, f'"{key}"'), False)
    missed = pc.and_kleene(pc.is_null(s), pc.is_null(raw))
    missed = pc.fill_null(missed, True)
    has_esc = pc.fill_null(pc.match_substring(col, "\\"), False)
    needs = pc.and_(has_key, pc.or_(missed, has_esc))
    if pc.any(needs).as_py():
        idx = np.nonzero(needs.to_numpy(zero_copy_only=False))[0]
        vals = out.to_pylist()
        raw = col.take(pa.array(idx)).to_pylist()
        for i, text in zip(idx, raw):
            vals[int(i)] = None
            try:
                obj = json.loads(text)
            except (ValueError, TypeError):
                continue
            if not isinstance(obj, dict) or key not in obj:
                continue
            v = obj[key]
            if v is None:
                pass
            elif isinstance(v, bool):
                vals[int(i)] = "true" if v else "false"
            elif isinstance(v, (dict, list)):
                vals[int(i)] = json.dumps(v, separators=(",", ":"))
            else:
                vals[int(i)] = str(v)
        out = pa.array(vals, pa.string())
    return out


def json_extract(ds, col: str, fields: dict[str, tuple[str, pa.DataType]],
                 drop: bool = False):
    """Extract typed scalar fields from a flat-JSON string column.

    ``fields``: {out_col: (json_key, arrow_type)} — one vectorized regex
    pass per key per batch; values cast from their literal text (booleans
    accept true/false).  ``drop=True`` removes the source column after
    extraction (the usual move before a shuffle — never ship raw JSON).
    """
    def fn(batch: pa.Table) -> pa.Table:
        src = batch[col]
        for out_name, (key, typ) in fields.items():
            text = _extract_one(src, key)
            if pa.types.is_boolean(typ):
                arr = pc.equal(text, "true")
                arr = pc.if_else(pc.is_null(text),
                                 pa.nulls(len(text), pa.bool_()), arr)
            elif pa.types.is_string(typ):
                arr = text
            else:
                arr = pc.cast(text, typ)
            batch = batch.append_column(out_name, arr)
        if drop:
            batch = batch.drop_columns([col])
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")
