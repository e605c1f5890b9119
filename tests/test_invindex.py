"""Stored positional inverted index: build → pruned probe roundtrip."""

import numpy as np
import pandas as pd

import ray.data as rd


def test_phrase_search_roundtrip(ray_session, tmp_path):
    from ttmf_ray.stages.invindex import (build_positional_index,
                                          phrase_search)

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "the quick brown fox jumps over the quick brown dog",
            "quick brown fox again and quick brown fox once more",
            "nothing to see here",
            "brown fox quick brown fox",
        ],
    })
    idx = str(tmp_path / "idx")
    build_positional_index(rd.from_pandas(docs), idx)

    out = phrase_search(idx, ["quick", "brown", "fox"])
    got = list(map(tuple, out.itertuples(index=False)))
    assert got == [(0, 1), (1, 0), (1, 5), (3, 2)]

    # absent term → empty result, no error (its bucket may not exist)
    assert phrase_search(idx, ["zebra", "fox"]).empty
    # single-term probe = plain posting list
    assert len(phrase_search(idx, ["fox"])) == 5
