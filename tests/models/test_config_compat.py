"""The reference's OWN yaml configs load through this framework's config
system unchanged (schema compatibility is the migration contract,
docs/migration.md)."""

import glob
import os

import pytest

from caiman_asr_tpu.models.config import load_config

REF_CONFIGS = "/root/reference/training/configs"


@pytest.mark.skipif(
    not os.path.isdir(REF_CONFIGS), reason="reference configs not mounted"
)
@pytest.mark.parametrize(
    "name", ["testing-1023sp.yaml", "base-8703sp.yaml", "large-17407sp.yaml"]
)
def test_reference_configs_load(name):
    bundle = load_config(os.path.join(REF_CONFIGS, name))
    cfg = bundle.cfg
    # canonical architecture facts from the reference docs
    expected = {
        "testing-1023sp.yaml": dict(enc_n_hid=1024),
        "base-8703sp.yaml": dict(enc_n_hid=1024, pred_n_hid=512,
                                 joint_n_hid=768, enc_post_rnn_layers=6),
        "large-17407sp.yaml": dict(enc_n_hid=1536, pred_n_hid=768,
                                   joint_n_hid=1024, enc_post_rnn_layers=6),
    }[name]
    for k, v in expected.items():
        assert getattr(cfg.rnnt, k) == v, (k, getattr(cfg.rnnt, k))
    assert cfg.input_train.logmel.sample_rate == 16000
    assert cfg.input_val.splicing.frame_stacking == 3
    assert cfg.tokenizer.labels  # charset present
