"""User meta-tokens (<EOS>, <star>, ...) from the config
(reference: utils/user_tokens.py, utils/user_tokens_lite.py).

User tokens live in the config's ``user_tokens:`` block and must be
``<tag>``-shaped; they are added to the sentencepiece vocab as user-defined
pieces at training time, so an existing tokenizer can resolve them to ids.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Union

_TAG_RE = re.compile(r"^<[^<>\s]+>$")


def is_tag(s: str) -> bool:
    return bool(_TAG_RE.match(s))


def get_all_user_tokens(user_tokens: Optional[dict]) -> Dict[str, str]:
    out = {}
    for k, v in (user_tokens or {}).items():
        if v is None:
            continue
        if not isinstance(v, str) or not is_tag(v):
            raise ValueError(f"user token {k}={v!r} must look like <tag>")
        out[k] = v
    return out


def get_user_token(
    name: str, user_tokens: Optional[dict], tokenizer=None
) -> Optional[Union[int, str]]:
    """Return the token string, or its vocab id when a tokenizer is given
    (reference user_tokens.py:9-37)."""
    toks = get_all_user_tokens(user_tokens)
    if name not in toks:
        return None
    sym = toks[name]
    if tokenizer is None:
        return sym
    ids = tokenizer.tokenize(sym)
    # the piece itself is the last id (a leading space marker may precede it)
    if not ids:
        raise ValueError(f"user token {name}={sym!r} is not in the vocab")
    piece = tokenizer.id_to_piece(ids[-1])
    if piece.lstrip("▁") != sym:
        raise ValueError(
            f"user token {name}={sym!r} does not tokenize to a single piece "
            f"(got {[tokenizer.id_to_piece(i) for i in ids]}); retrain the "
            "sentencepiece model with user_symbols including it"
        )
    return ids[-1]
