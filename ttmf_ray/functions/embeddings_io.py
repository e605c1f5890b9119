"""Embedding persistence + matrix assembly (SURVEY.md S4/S5).

Parquet replaces the reference's ``key v1 … v100`` text rows
(`TransE.java:773-789`); matrix assembly replicates the reference's
loader conventions (`PrecessData.py:13-38`): a dense ``(|vocab|+2, k)``
matrix, row 0 reserved (all zeros — the padding row implied by 1-based
vocab indexing), one shared ``**UNK**`` row drawn U(−0.25, 0.25) from a
seeded RNG assigned to every vocab word with no stored vector.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

UNK = "**UNK**"


def write_embeddings_parquet(path: str, ids: np.ndarray, vecs: np.ndarray) -> None:
    """(id, vec: fixed_size_list<float32, k>) parquet."""
    k = vecs.shape[1]
    flat = pa.array(vecs.astype(np.float32).reshape(-1), pa.float32())
    t = pa.table({
        "id": pa.array(ids.astype(np.int32)),
        "vec": pa.FixedSizeListArray.from_arrays(flat, k),
    })
    pq.write_table(t, path)


def read_embeddings_parquet(path: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(path)
    ids = t.column("id").to_numpy()
    vec_type = t.schema.field("vec").type
    k = vec_type.list_size
    flat = t.column("vec").combine_chunks().flatten().to_numpy()
    return ids, flat.reshape(len(ids), k)


def assemble_matrix(vocab_ids: np.ndarray, stored_ids: np.ndarray,
                    stored_vecs: np.ndarray, *, k: int,
                    seed: int = 1337) -> tuple[np.ndarray, int]:
    """Dense ``(len(vocab)+2, k)`` matrix per the reference loader:

    - row 0: zeros (padding);
    - row i+1: vector of vocab_ids[i] if stored;
    - missing vocab entries share ONE ``**UNK**`` row, drawn U(−0.25, 0.25)
      (`PrecessData.py:24-27,33-35`), placed at the last row.

    Returns (matrix, n_unk).
    """
    rng = np.random.default_rng(seed)
    W = np.zeros((len(vocab_ids) + 2, k), dtype=np.float32)
    unk_row = rng.uniform(-0.25, 0.25, k).astype(np.float32)
    W[-1] = unk_row
    lookup = {int(i): j for j, i in enumerate(stored_ids)}
    n_unk = 0
    for j, vid in enumerate(vocab_ids):
        sj = lookup.get(int(vid))
        if sj is None:
            W[j + 1] = unk_row
            n_unk += 1
        else:
            W[j + 1] = stored_vecs[sj]
    return W, n_unk


def embeddings_to_dataframe(E: np.ndarray) -> pd.DataFrame:
    return pd.DataFrame({
        "id": np.arange(len(E), dtype=np.int64),
        "vec": [row.astype(np.float32).tolist() for row in E],
    })
