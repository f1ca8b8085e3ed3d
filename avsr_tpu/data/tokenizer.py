"""Tokenizers for avsr_tpu.

The reference leans on HF AutoTokenizer downloads (simple_dataset.py:557-570).
Here there are two paths:

  * ``ByteTokenizer`` — a fully self-contained byte-level tokenizer (ids
    0..255 are raw bytes; BOS/EOS/PAD appended above). No assets, no
    network; the default for synthetic data, tests, and benches.
  * ``load_tokenizer(path)`` — wraps a local HF tokenizer directory
    (tokenizer.json via the ``tokenizers`` library) when real model assets
    are on disk.

Both expose the same tiny interface: encode / decode / bos_id / eos_id /
pad_id / vocab_size.
"""

from __future__ import annotations

from pathlib import Path


class ByteTokenizer:
    """UTF-8 byte-level tokenizer: ids 0..255 bytes, then BOS/EOS/PAD."""

    def __init__(self) -> None:
        self.bos_id = 256
        self.eos_id = 257
        self.pad_id = 258
        self.vocab_size = 259

    def encode(self, text: str, *, add_bos: bool = False,
               add_eos: bool = False) -> list[int]:
        ids = list(text.encode("utf-8"))
        if add_bos:
            ids = [self.bos_id] + ids
        if add_eos:
            ids = ids + [self.eos_id]
        return ids

    def decode(self, ids) -> str:
        data = bytes(int(i) for i in ids if 0 <= int(i) < 256)
        return data.decode("utf-8", errors="replace")


class HFTokenizer:
    """Local HF ``tokenizer.json`` wrapper (no network)."""

    def __init__(self, path: str | Path) -> None:
        from tokenizers import Tokenizer

        path = Path(path)
        tok_file = path / "tokenizer.json" if path.is_dir() else path
        self._tok = Tokenizer.from_file(str(tok_file))
        self.vocab_size = self._tok.get_vocab_size()

        def find(cands, default):
            for c in cands:
                i = self._tok.token_to_id(c)
                if i is not None:
                    return i
            return default

        self.bos_id = find(["<s>", "<|begin_of_text|>", "<bos>"], 1)
        self.eos_id = find(["</s>", "<|end_of_text|>", "<eos>"], 2)
        self.pad_id = find(["<pad>", "<|finetune_right_pad_id|>"], self.eos_id)

    def encode(self, text: str, *, add_bos: bool = False,
               add_eos: bool = False) -> list[int]:
        ids = self._tok.encode(text, add_special_tokens=False).ids
        if add_bos:
            ids = [self.bos_id] + ids
        if add_eos:
            ids = ids + [self.eos_id]
        return ids

    def decode(self, ids) -> str:
        ids = [int(i) for i in ids
               if int(i) not in (self.bos_id, self.eos_id, self.pad_id)]
        return self._tok.decode(ids)


def load_tokenizer(path: str | Path | None = None):
    """Byte tokenizer when no assets are given, HF tokenizer otherwise."""
    if not path:
        return ByteTokenizer()
    return HFTokenizer(path)
