"""Parquet codec: the reference's on-disk DAG schema <-> dense numpy tensors.

The reference serializes a topologically-sorted labeled DAG as ``l{i}``
(uint16 label) and ``e{i}`` (length-``i`` '0'/'1' bitstring of in-edges from
slots ``< i``) columns (``src/toolkit/labeled.py:116-185``).  This module
reads/writes that exact schema so existing corpora round-trip, but decodes
straight into ``(labels: int32[B, N], adj: float32[B, N, N])`` batches with
vectorized numpy — no per-graph Python objects (the reference's per-row
igraph construction, ``src/datasets.py:8-27``, is the load-time bottleneck
this removes).
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def pyarrow_schema(num_vertices: int) -> pa.Schema:
    """The reference-compatible schema (``src/toolkit/labeled.py:116-130``)."""
    label_fields = [
        pa.field(f"l{i}", pa.uint16(), nullable=False) for i in range(num_vertices)
    ]
    edge_fields = [
        pa.field(f"e{i}", pa.string(), nullable=False) for i in range(num_vertices)
    ]
    return pa.schema(label_fields + edge_fields)


def _column_bitstring_buffer(col: pa.ChunkedArray, width: int, rows: int):
    """Zero-copy view of a fixed-width string column's data bytes, or None.

    Arrow stores a string column as (offsets, data); when every row is
    exactly ``width`` chars with no nulls, ``data`` IS the concatenation of
    all bitstrings — no per-row Python string materialization needed.
    """
    arr = col.combine_chunks()
    if arr.null_count:
        return None
    if isinstance(arr, pa.ChunkedArray):  # empty table edge case
        return None
    offsets_buf = arr.buffers()[1]
    data_buf = arr.buffers()[2]
    if offsets_buf is None or data_buf is None:
        return None
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(offsets_buf, dtype=off_dtype)[
        arr.offset : arr.offset + rows + 1
    ]
    if offsets[-1] - offsets[0] != rows * width:
        return None
    if not np.all(np.diff(offsets) == width):
        return None
    data = np.frombuffer(data_buf, dtype=np.uint8)
    return data[offsets[0] : offsets[0] + rows * width]


def table_to_tensors(table: pa.Table) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a pyarrow table of l/e columns to (labels[B,N], adj[B,N,N]).

    Fast path: zero-copy arrow buffers + the native decode kernel
    (``native/fast_codec.cpp``); numpy strided stores otherwise.
    """
    label_cols = sorted(
        (c for c in table.column_names if c.startswith("l") and c[1:].isdigit()),
        key=lambda c: int(c[1:]),
    )
    n = len(label_cols)
    rows = table.num_rows

    labels = np.stack(
        [table.column(c).to_numpy().astype(np.int32) for c in label_cols], axis=1
    )

    adj = np.zeros((rows, n, n), dtype=np.float32)
    buffers = {}
    for i in range(1, n):
        buf = _column_bitstring_buffer(table.column(f"e{i}"), i, rows)
        if buf is None:  # irregular column: per-row fallback
            joined = "".join(table.column(f"e{i}").to_pylist())
            buf = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
        buffers[i] = np.ascontiguousarray(buf)

    from dags_vae_search_tpu import native

    lib = native.load()
    if lib is not None and rows:
        import ctypes

        col_ptrs = (ctypes.c_char_p * n)()
        for i in range(1, n):
            col_ptrs[i] = buffers[i].ctypes.data_as(ctypes.c_char_p).value
        lib.decode_edges(
            col_ptrs, n, rows, adj.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
    else:
        for i in range(1, n):
            bits = buffers[i].reshape(rows, i)
            adj[:, :i, i] = bits - ord("0")

    return labels, adj


def tensors_to_table(labels: np.ndarray, adj: np.ndarray) -> pa.Table:
    """Encode (labels[B,N], adj[B,N,N]) into the reference l/e schema.

    Edge columns are built straight from byte buffers (arrow
    ``StringArray.from_buffers``), skipping per-row Python strings.
    """
    rows, n = labels.shape
    arrays = {}
    for i in range(n):
        arrays[f"l{i}"] = pa.array(labels[:, i].astype(np.uint16), type=pa.uint16())
    for i in range(n):
        if i == 0:
            data = np.zeros(0, dtype=np.uint8)
        else:
            data = np.where(adj[:, :i, i] > 0, ord("1"), ord("0")).astype(
                np.uint8
            ).reshape(-1)
        offsets = (np.arange(rows + 1, dtype=np.int32) * i)
        arrays[f"e{i}"] = pa.StringArray.from_buffers(
            rows, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())
        )
    names = [f"l{i}" for i in range(n)] + [f"e{i}" for i in range(n)]
    return pa.table({k: arrays[k] for k in names}).cast(pyarrow_schema(n))


def read_dataset(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a parquet dataset dir/file into (labels, adj) tensors."""
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet") and os.path.getsize(os.path.join(path, f)) > 0
        )
        tables = [pq.read_table(p) for p in parts]
        table = pa.concat_tables(tables, promote_options="default") if len(tables) > 1 else tables[0]
    else:
        table = pq.read_table(path)
    return table_to_tensors(table)


def write_dataset(
    path: str,
    labels: np.ndarray,
    adj: np.ndarray,
    rows_per_part: int = 200_000,
) -> None:
    """Write (labels, adj) as a reference-schema parquet dataset directory."""
    os.makedirs(path, exist_ok=True)
    rows = labels.shape[0]
    part = 0
    for start in range(0, rows, rows_per_part):
        stop = min(start + rows_per_part, rows)
        table = tensors_to_table(labels[start:stop], adj[start:stop])
        pq.write_table(table, os.path.join(path, f"part-{part:05d}.parquet"))
        part += 1


def write_corpus(path: str, corpus, rows_per_part: int = 50_000) -> None:
    """Write a (possibly bit-packed) training Corpus as parquet parts,
    materializing dense adjacency one part at a time."""
    os.makedirs(path, exist_ok=True)
    rows = len(corpus)
    part = 0
    for start in range(0, rows, rows_per_part):
        stop = min(start + rows_per_part, rows)
        idx = np.arange(start, stop)
        table = tensors_to_table(corpus.labels[idx], corpus.dense_batch(idx))
        pq.write_table(table, os.path.join(path, f"part-{part:05d}.parquet"))
        part += 1


def read_dvae_txt(path: str):
    """Import legacy D-VAE-format text files: one python-literal
    ``([[type, in_bits...], ...], y)`` tuple per line
    (parity with ``bn_from_txt``, ``src/parquet_utils.py:10-30``).

    Returns (labels int32[B, N], adj float32[B, N, N], metrics float64[B]).
    """
    import ast

    all_labels, all_rows, metrics = [], [], []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            row, y = ast.literal_eval(line)
            all_labels.append([v[0] for v in row])
            all_rows.append([v[1:] for v in row])
            metrics.append(float(y))
    n = len(all_labels[0])
    rows = len(all_labels)
    labels = np.asarray(all_labels, dtype=np.int32)
    adj = np.zeros((rows, n, n), dtype=np.float32)
    for r, row in enumerate(all_rows):
        for i, in_bits in enumerate(row):
            for j, bit in enumerate(in_bits):
                if bit:
                    adj[r, j, i] = 1.0
    return labels, adj, np.asarray(metrics, dtype=np.float64)


def iter_batches(
    path: str, batch_size: int
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Stream fixed-size (labels, adj) batches from a parquet dataset.

    Row-group streaming analogue of ``bn_parquet_iterator``
    (``src/parquet_utils.py:33-49``) but yielding dense batches: one parquet
    row group is resident at a time (plus the carry buffer), so link-scale
    corpora (n=724 — ~2 MB dense adjacency per graph) never materialize
    fully in host memory.  A trailing partial batch is dropped, matching
    the fixed-shape device-dispatch contract.
    """
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
            and os.path.getsize(os.path.join(path, f)) > 0
        )
    else:
        parts = [path]

    pending: list[Tuple[np.ndarray, np.ndarray]] = []
    pending_rows = 0
    for part in parts:
        pf = pq.ParquetFile(part)
        for rg in range(pf.num_row_groups):
            labels, adj = table_to_tensors(pf.read_row_group(rg))
            pending.append((labels, adj))
            pending_rows += labels.shape[0]
            while pending_rows >= batch_size:
                cat_labels = np.concatenate([p[0] for p in pending])
                cat_adj = np.concatenate([p[1] for p in pending])
                for start in range(
                    0, cat_labels.shape[0] - batch_size + 1, batch_size
                ):
                    yield (
                        cat_labels[start : start + batch_size],
                        cat_adj[start : start + batch_size],
                    )
                rem = cat_labels.shape[0] % batch_size
                if rem:
                    pending = [(cat_labels[-rem:], cat_adj[-rem:])]
                else:
                    pending = []
                pending_rows = rem
