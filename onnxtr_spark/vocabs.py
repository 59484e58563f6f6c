"""Recognition vocabularies (F4).

Full language-vocab table matching the reference bit-for-bit
(onnxtr/utils/vocabs.py:233-1138): 214 entries — base character sets
plus 60+ composed language vocabs. Content AND order match, because a
reference-trained recognition checkpoint encodes the label->char map as
the vocab string position and uses blank index ``len(vocab)``
(models/recognition/models/crnn.py:61-101); any divergence decodes
garbage. Data lives in ``vocab_data.py`` (generated, see
tools/gen_vocabs.py); this module is the public surface.

The default recognition vocab is ``VOCABS["french"]`` like the
reference (models/recognition/models/crnn.py:25): digits + ascii
letters + punctuation, then ``°`` + currency ``£€¥¢฿``, then French
accents — 126 characters, no space.
"""

from onnxtr_spark.vocab_data import VOCAB_DATA

VOCABS: dict[str, str] = VOCAB_DATA

DIGITS = VOCABS["digits"]
ASCII_LETTERS = VOCABS["ascii_letters"]
PUNCTUATION = VOCABS["punctuation"]
CURRENCY = VOCABS["currency"]

DEFAULT_VOCAB = VOCABS["french"]

# The deterministic glyph renderer/recognizer stubs (imaging.py) encode
# a character as pixel value CHAR_BASE + index, so only vocabs shorter
# than 130 chars are renderable in tests. This is a stub limitation,
# not an engine one — the real path carries logits of width
# len(vocab)+1 for any vocab.
MAX_RENDERABLE = 130


def renderable(name: str) -> bool:
    return len(VOCABS[name]) < MAX_RENDERABLE
