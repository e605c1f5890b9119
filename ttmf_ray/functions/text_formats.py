"""Reference-native TEXT file formats for vocab, id triples and
embeddings, so artifacts move BOTH ways between this engine and the
reference's pipeline:

- ``entity2id.txt`` / ``relation2id.txt`` — ``name<TAB>id`` lines
  (`get_triples/process_triples.py:105-111`);
- ``{train,valid,test}2id.txt`` — space-separated header-less id triples
  (`process_triples.py:113-115`, pandas ``to_csv(sep=" ")``);
- embedding text — ``key v1 … vk`` space-separated rows
  (`PrecessData.py:13-38` ``load_vec_txt``; written by the reference's
  KGE stage, `TransE.java:773-789`).

Vocab and embedding files are vocab-bounded (driver-writable by the same
ceiling argument as the weight matrices); the id-TRIPLE files are
corpus-bounded, so they stream through Ray CSV read/write like the TSV
edge files (`sources/triples_tsv.py`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

ID_TRIPLE_COLS = ["h", "t", "r"]


# --- name <TAB> id vocab files ---------------------------------------------

def write_vocab_txt(vocab_df: pd.DataFrame, path: str) -> None:
    with open(path, "w") as f:
        for name, i in zip(vocab_df["name"], vocab_df["id"]):
            f.write(f"{name}\t{int(i)}\n")


def read_vocab_txt(path: str) -> pd.DataFrame:
    df = pd.read_csv(path, sep="\t", header=None, names=["name", "id"],
                     dtype={"name": str, "id": np.int32})
    return df


# --- space-separated id triples (train2id.txt etc.) ------------------------

def write_id_triples_txt(ids_ds, out_dir: str) -> None:
    """(h, t, r) Dataset → space-separated header-less text shards."""

    def args():
        from pyarrow import csv as pacsv

        return {"write_options": pacsv.WriteOptions(include_header=False,
                                                    delimiter=" ")}

    ids_ds.select_columns(ID_TRIPLE_COLS).write_csv(
        out_dir, arrow_csv_args_fn=args)


def read_id_triples_txt(path) -> "rd.Dataset":
    from pyarrow import csv as pacsv

    return rd.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter=" "),
        read_options=pacsv.ReadOptions(column_names=ID_TRIPLE_COLS))


# --- key v1 … vk embedding text --------------------------------------------

def write_embeddings_txt(path: str, keys, vecs: np.ndarray) -> None:
    """``key v1 … vk`` rows; %.9g preserves float32 exactly."""
    vecs = np.asarray(vecs, dtype=np.float32)
    with open(path, "w") as f:
        for key, row in zip(keys, vecs):
            f.write(str(key) + " "
                    + " ".join(np.format_float_positional(
                        v, unique=True, trim="-") for v in row)
                    + "\n")


def read_embeddings_txt(path: str) -> tuple[list[str], np.ndarray]:
    """Reference loader semantics (`PrecessData.py:18-22`): first token
    is the key, the rest parse as float32."""
    keys: list[str] = []
    rows: list[np.ndarray] = []
    with open(path) as f:
        for line in f:
            values = line.split()
            if not values:
                continue
            keys.append(values[0])
            rows.append(np.asarray(values[1:], dtype=np.float32))
    return keys, (np.stack(rows) if rows
                  else np.empty((0, 0), dtype=np.float32))
