"""Media-stage plumbing tests (decoder stubbed; Ray plumbing real)."""

import numpy as np
import pytest

import ray.data as rd

from ttmf_ray.stages.media import (MEDIA_SCHEMA, MediaFeatureConfig,
                                   media_features, real_decode,
                                   synth_media_batch)


def test_synth_media_schema_and_determinism():
    a = synth_media_batch(np.arange(20))
    b = synth_media_batch(np.arange(20))
    assert a.schema.equals(MEDIA_SCHEMA)
    assert a.equals(b)


def test_media_features_pipeline():
    t = synth_media_batch(np.arange(50))
    out = media_features(rd.from_arrow(t), concurrency=1).to_pandas()
    assert len(out) == 50
    assert set(out.columns) == {"media_id", "kind", "feat_mean", "feat_std",
                                "feat_min", "feat_max"}
    assert (out["feat_max"] <= 255).all() and (out["feat_min"] >= 0).all()


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image/jpeg")
