from caiman_asr_tpu.keywords.trie import Keywords
from caiman_asr_tpu.keywords.process import load_keywords

__all__ = ["Keywords", "load_keywords"]
