"""Vendored API double of huggingface `tokenizers` — just the surface
risjbot_spark.tokenization touches (Tokenizer.from_file /
encode_batch / Encoding.ids), with DISTINCTIVE deterministic output
(2·words + 1 token ids) so tests can tell the real branch ran."""


class _Encoding:
    def __init__(self, ids):
        self.ids = ids


class Tokenizer:
    def __init__(self, path=None):
        self.path = path

    @staticmethod
    def from_file(path):
        return Tokenizer(path)

    def encode_batch(self, texts):
        return [_Encoding(list(range(2 * len(t.split()) + 1)))
                for t in texts]
