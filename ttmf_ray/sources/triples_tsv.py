"""Tab-separated triple text files — the reference's native on-disk KG
format (`get_triples/train_test_split.py:28` reads them with pandas
``read_csv(sep="\\t", header=None)``; `PrecessData.py:49` splits lines
on ``'\\t'``).  A user of the reference moves KGs between its stages as
these files, so the rebuild ingests and emits the same format.

Writer: ``Dataset.write_csv`` with header-less tab ``WriteOptions`` —
one file per block (parallel, resumable).  Reader: ``ray.data.read_csv``
with tab ``ParseOptions`` and pinned column names — streams blocks
straight off storage, no driver pass.  PyArrow's default quoting
("needed") round-trips values containing delimiters.
"""

from __future__ import annotations

import ray.data as rd

TRIPLE_COLS = ["subj", "pred", "obj"]


def _tsv_write_args():
    # WriteOptions is not picklable — Ray ships this FACTORY to the write
    # tasks instead (arrow_csv_args_fn), each constructing options locally
    from pyarrow import csv as pacsv

    return {"write_options": pacsv.WriteOptions(include_header=False,
                                                delimiter="\t")}


def write_triples_tsv(edges_ds, out_dir: str) -> None:
    edges_ds.select_columns(TRIPLE_COLS).write_csv(
        out_dir, arrow_csv_args_fn=_tsv_write_args)


def read_triples_tsv(path) -> "rd.Dataset":
    from pyarrow import csv as pacsv

    return rd.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter="\t"),
        read_options=pacsv.ReadOptions(column_names=TRIPLE_COLS))
