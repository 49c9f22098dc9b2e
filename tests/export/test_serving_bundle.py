"""Serving-bundle export tests (reference: tests/export/ hardware ckpt)."""

import json

import jax
import numpy as np
import pytest

from caiman_asr_tpu.export.checkpointer import save_checkpoint
from caiman_asr_tpu.export.model_schema import (
    CheckpointNotSupportedError,
    check_schema_training,
    get_schema,
    return_schemas,
)
from caiman_asr_tpu.export.serving_bundle import (
    create_serving_bundle,
    load_serving_bundle,
)
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig

MINI_YAML = """
tokenizer:
  sentpiece_model: {spm}
rnnt:
  in_feats: 8
  enc_n_hid: 8
  enc_pre_rnn_layers: 1
  enc_post_rnn_layers: 1
  pred_n_hid: 8
  pred_rnn_layers: 1
  joint_n_hid: 8
ngram:
  ngram_path:
  scale_factor: 0.05
"""


@pytest.fixture(scope="module")
def mini_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("bundle")
    model = RNNT(
        RNNTModelConfig(
            in_feats=8, enc_n_hid=8, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
            pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=8,
        ),
        n_classes=6,
    )
    params = model.init(jax.random.PRNGKey(0))
    good = root / "good.npz"
    save_checkpoint(good, params, params, None,
                    {"logmel_norm_weight": 1.0, "step": 10, "best_wer": 0.2})
    bad = root / "bad_ramp.npz"
    save_checkpoint(bad, params, None, None, {"logmel_norm_weight": 0.5})
    spm = root / "tok.json"
    spm.write_text(json.dumps({"pieces": [["▁a", -1.0, 1]]}))
    cfg = root / "cfg.yaml"
    cfg.write_text(MINI_YAML.format(spm=spm))
    stats = root / "stats.npz"
    np.savez(stats, melmeans=np.zeros(80, np.float32), melvars=np.ones(80, np.float32))
    return root, good, bad, cfg, stats, params


def test_schemas_exist_and_differ():
    schemas = return_schemas()
    assert len(schemas) == 2 and schemas[0] != schemas[1]
    assert all(len(s) == 47 for s in schemas)


def test_schema_gate(mini_ckpt):
    root, good, bad, cfg, stats, params = mini_ckpt
    with pytest.raises(CheckpointNotSupportedError):
        check_schema_training(params, skip_state_dict_check=False)
    check_schema_training(params, skip_state_dict_check=True)  # no raise
    assert "joint_fc/w" in get_schema(params)


def test_bundle_rejects_incomplete_ramp(mini_ckpt):
    root, good, bad, cfg, stats, params = mini_ckpt
    with pytest.raises(ValueError, match="logmel_norm_weight"):
        create_serving_bundle(bad, cfg, root / "hw.npz",
                              skip_state_dict_check=True)


def test_bundle_roundtrip(mini_ckpt):
    root, good, bad, cfg, stats, params = mini_ckpt
    out = create_serving_bundle(
        good, cfg, root / "hw.npz", mel_stats_path=stats,
        skip_state_dict_check=True,
    )
    weights, extras, meta = load_serving_bundle(out)
    assert meta["version"] == 1 and meta["step"] == 10
    assert "melmeans" in extras and "sentencepiece" in extras
    for a, b in zip(jax.tree.leaves(weights), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
