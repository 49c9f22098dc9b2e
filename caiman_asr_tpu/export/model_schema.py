"""Model schema gate (reference: export/model_schema/__init__.py:28-66).

The serving stack only accepts the exact base/large parameter layouts; this
gate compares a parameter tree's {name: shape} map against the stored
schemas (caiman_asr_tpu/export/schemas/{base,large}.json, generated from the
canonical configs via ``python -m caiman_asr_tpu.export.model_schema``).
"""

from __future__ import annotations

import json
from enum import Enum
from pathlib import Path
from typing import Dict, List

from caiman_asr_tpu.export.checkpointer import flatten_named

SCHEMA_DIR = Path(__file__).parent / "schemas"


class CheckpointNotSupportedError(Exception):
    pass


class ModelVariant(Enum):
    BASE = "base"
    LARGE = "large"


def return_schemas() -> List[dict]:
    out = []
    for v in ModelVariant:
        p = SCHEMA_DIR / f"{v.value}.json"
        out.append(json.loads(p.read_text()))
    return out


def get_schema(params) -> Dict[str, list]:
    return {k: list(v.shape) for k, v in flatten_named(params).items()}


def check_model_schema(params, schemas: List[dict]):
    schema = get_schema(params)
    if sum(1 for s in schemas if s == schema) != 1:
        raise CheckpointNotSupportedError(
            "Model parameter shapes do not match any supported ModelVariant "
            f"({[v.name for v in ModelVariant]})."
        )


def check_schema_training(params, skip_state_dict_check: bool):
    try:
        check_model_schema(params, return_schemas())
    except CheckpointNotSupportedError as e:
        if not skip_state_dict_check:
            raise CheckpointNotSupportedError(
                str(e) + "\nPass --skip_state_dict_check to bypass (the model "
                "will not be loadable by the serving stack)."
            )


def generate_schemas():
    """Regenerate schema JSONs from the canonical configs (CLI entry)."""
    import jax

    from caiman_asr_tpu.models.config import load_config
    from caiman_asr_tpu.models.rnnt import RNNT

    SCHEMA_DIR.mkdir(exist_ok=True)
    for variant, cfg_path, n_classes in [
        ("base", "configs/base-8703sp.yaml", 8704),
        ("large", "configs/large-17407sp.yaml", 17408),
    ]:
        bundle = load_config(cfg_path)
        model = RNNT(bundle.cfg.rnnt, n_classes)
        shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))

        def flat_shapes(tree, prefix=""):
            out = {}
            if isinstance(tree, dict):
                for k, v in tree.items():
                    out.update(flat_shapes(v, f"{prefix}{k}/"))
            elif isinstance(tree, (list, tuple)):
                for i, v in enumerate(tree):
                    out.update(flat_shapes(v, f"{prefix}{i}/"))
            else:
                out[prefix[:-1]] = list(tree.shape)
            return out

        schema = flat_shapes(shapes)
        (SCHEMA_DIR / f"{variant}.json").write_text(json.dumps(schema, indent=1))
        print(f"wrote {variant}.json ({len(schema)} tensors)")


if __name__ == "__main__":
    generate_schemas()
