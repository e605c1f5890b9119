"""Link-prediction eval, error report, and embedding I/O tests."""

import numpy as np
import pandas as pd

import ray.data as rd


def test_link_prediction_perfect_embeddings():
    # hand-crafted 2-d embeddings where gold tails are exact translations:
    # E[i] = (i, 0), R[0] = (1, 0) → (h, h+1, 0) has energy 0, all others > 0
    from ttmf_ray.functions.eval import link_prediction_eval

    n = 10
    E = np.stack([np.arange(n, dtype=float), np.zeros(n)], axis=1)
    R = np.array([[1.0, 0.0]])
    test = pd.DataFrame({"h": [0, 3, 5], "t": [1, 4, 6], "r": [0, 0, 0]})
    gold = frozenset((i, i + 1, 0) for i in range(n - 1))
    m = link_prediction_eval(rd.from_pandas(test), E, R, gold, concurrency=1)
    assert m["hits1_raw"] == 1.0
    assert m["mean_rank_raw"] == 1.0
    assert m["hits1_filtered"] == 1.0


def test_link_prediction_filtered_beats_raw():
    from ttmf_ray.functions.eval import link_prediction_eval

    rng = np.random.default_rng(0)
    n = 30
    E = rng.standard_normal((n, 4))
    R = rng.standard_normal((2, 4))
    test = pd.DataFrame({"h": [0], "t": [1], "r": [0]})
    # every other entity also forms a gold triple (0, e, 0) → filtered rank
    # for the tail side must be 1 (all competitors removed)
    gold = frozenset((0, e, 0) for e in range(n))
    m = link_prediction_eval(rd.from_pandas(test), E, R, gold, concurrency=1)
    assert m["mean_rank_filtered"] <= m["mean_rank_raw"]


def test_error_report_orders_and_unmaps():
    from ttmf_ray.functions.eval import error_report

    scored = pd.DataFrame({
        "h": [0, 1, 2], "t": [1, 2, 0], "r": [0, 0, 1],
        "flag": [1, -1, 1],
        "conf": [0.9, 0.1, 0.5],
    })
    ents = np.array(["A", "B", "C"], dtype=object)
    rels = np.array(["likes", "hates"], dtype=object)
    rep = error_report(scored, ents, rels, top_k=2)
    assert list(rep["conf"]) == [0.1, 0.5]
    assert rep.iloc[0]["subj"] == "B" and rep.iloc[0]["obj"] == "C"
    rep2 = error_report(scored, ents, rels, threshold=0.2, top_k=None)
    assert len(rep2) == 1


def test_embeddings_roundtrip_and_unk(tmp_path):
    from ttmf_ray.functions.embeddings_io import (assemble_matrix,
                                                  read_embeddings_parquet,
                                                  write_embeddings_parquet)

    rng = np.random.default_rng(1)
    ids = np.array([0, 1, 2, 5])
    vecs = rng.standard_normal((4, 8)).astype(np.float32)
    path = str(tmp_path / "emb.parquet")
    write_embeddings_parquet(path, ids, vecs)
    rids, rvecs = read_embeddings_parquet(path)
    assert np.array_equal(rids, ids)
    assert np.array_equal(rvecs, vecs)

    vocab = np.arange(7)
    W, n_unk = assemble_matrix(vocab, rids, rvecs, k=8)
    assert W.shape == (9, 8)
    assert n_unk == 3                      # ids 3, 4, 6 missing
    assert np.array_equal(W[0], np.zeros(8))      # padding row
    assert np.array_equal(W[1], vecs[0])          # vocab[0] → stored id 0
    assert np.array_equal(W[4], W[5])             # both missing → shared UNK
    assert np.array_equal(W[4], W[-1])


def test_reference_text_formats_roundtrip(tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ttmf_ray.functions.text_formats import (
        read_embeddings_txt, read_id_triples_txt, read_vocab_txt,
        write_embeddings_txt, write_id_triples_txt, write_vocab_txt)

    # entity2id.txt: name \t id (process_triples.py:105-111)
    vocab = pd.DataFrame({"name": ["alpha", "beta c", "gamma_1"],
                          "id": np.arange(3, dtype=np.int32)})
    p = tmp_path / "entity2id.txt"
    write_vocab_txt(vocab, str(p))
    assert p.read_text().splitlines()[1] == "beta c\t1"
    back = read_vocab_txt(str(p))
    pd.testing.assert_frame_equal(back, vocab)

    # train2id.txt: space-separated header-less id triples
    rng = np.random.default_rng(0)
    ids = pd.DataFrame({
        "h": rng.integers(0, 50, 200).astype(np.int64),
        "t": rng.integers(0, 50, 200).astype(np.int64),
        "r": rng.integers(0, 7, 200).astype(np.int64),
    })
    d = tmp_path / "train2id"
    write_id_triples_txt(rd.from_pandas(ids), str(d))
    got = read_id_triples_txt(str(d)).to_pandas() \
        .sort_values(["h", "t", "r"], ignore_index=True)
    want = ids.sort_values(["h", "t", "r"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want)

    # key v1 .. vk embedding rows: float32-exact roundtrip
    keys = [f"e{i}" for i in range(10)]
    vecs = rng.standard_normal((10, 16)).astype(np.float32)
    ep = tmp_path / "emb.txt"
    write_embeddings_txt(str(ep), keys, vecs)
    k2, v2 = read_embeddings_txt(str(ep))
    assert k2 == keys
    assert np.array_equal(v2, vecs)
    # reference loader parses the same lines (first token = key)
    first = ep.read_text().splitlines()[0].split()
    assert first[0] == "e0" and len(first) == 17
