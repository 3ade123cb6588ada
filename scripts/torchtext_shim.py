"""Minimal ``torchtext`` stand-in so the reference data pipeline can run here.

The reference loads GloVe at import time through
``torchtext.vocab.pretrained_aliases["glove.6B.300d"]()`` (reference
dataset.py:19-24). torchtext is not installed in this image and the real
alias would download 800 MB; for the dual-train parity harness
(scripts/parity_run.py) we only need the reference to see the *same* word
vectors our framework uses. Importing this module registers a fake
``torchtext`` in ``sys.modules`` whose alias parses the GloVe-format text
file named by the ``VML_GLOVE_TXT`` environment variable (the parity
fixture's tiny vocabulary).

The returned object exposes exactly the attributes the reference touches:
``itos`` (list), ``stoi`` (dict), ``vectors`` (torch.FloatTensor), ``dim``.
"""

from __future__ import annotations

import os
import sys
import types


class _Vocab:
    def __init__(self, path: str):
        import torch

        words, rows = [], []
        with open(path) as f:
            for line in f:
                parts = line.rstrip("\n").split(" ")
                words.append(parts[0])
                rows.append([float(x) for x in parts[1:]])
        self.itos = words
        self.stoi = {w: i for i, w in enumerate(words)}
        self.vectors = torch.tensor(rows, dtype=torch.float32)
        self.dim = self.vectors.shape[1]


def _alias_factory():
    path = os.environ.get("VML_GLOVE_TXT")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "torchtext_shim: set VML_GLOVE_TXT to a GloVe-format .txt file "
            "(the parity fixture writes one under <root>/glove/)"
        )
    return _Vocab(path)


def install() -> None:
    if "torchtext" in sys.modules:  # real torchtext or already installed
        return
    mod = types.ModuleType("torchtext")
    vocab_mod = types.ModuleType("torchtext.vocab")
    vocab_mod.pretrained_aliases = {"glove.6B.300d": _alias_factory}
    mod.vocab = vocab_mod
    sys.modules["torchtext"] = mod
    sys.modules["torchtext.vocab"] = vocab_mod


install()
