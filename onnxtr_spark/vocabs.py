"""Recognition vocabularies.

Re-derives the reference's vocab-composition approach
(onnxtr/utils/vocabs.py:12,233-…): base character sets composed into
language vocabs; the default recognition vocab is ``VOCABS["french"]``
(models/recognition/models/crnn.py:25). Only the subsets needed by the
pipeline are included; characters are public ASCII/latin-1.
"""

DIGITS = "0123456789"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
ASCII_UPPER = ASCII_LOWER.upper()
PUNCTUATION = r"!\"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"

_ENGLISH = ASCII_LOWER + ASCII_UPPER + DIGITS + PUNCTUATION + " "
_FRENCH_EXTRA = "àâéèêëîïôùûüçÀÂÉÈÊËÎÏÔÙÛÜÇ°"

VOCABS: dict[str, str] = {
    "digits": DIGITS,
    "english": _ENGLISH,
    "french": _ENGLISH + _FRENCH_EXTRA,
}

DEFAULT_VOCAB = VOCABS["french"]
