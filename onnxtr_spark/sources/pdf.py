"""PDF text extraction (S1 + the north-rule's "PDF/layout parse").

The reference rasterizes PDFs with pypdfium2 (io/pdf.py:16-43) and
re-enters the image pipeline; that library is absent here, and at
10^12 docs the cheaper primitive for born-digital PDFs is direct
content-stream text extraction. This module implements a real, minimal
PDF 1.4 parser for that path:

- ``encode_pdf``: build a valid PDF (catalog → pages tree → one page +
  FlateDecode content stream per input text, xref table, trailer). Any
  standard reader opens these files.
- ``decode_pdf_texts``: scan ``stream``/``endstream`` segments,
  zlib-inflate when compressed, and evaluate the text-showing operators
  ``(…) Tj`` and ``[(…) … (…)] TJ`` in order, unescaping PDF string
  escapes (backslash specials + octal).

The Spark surface is Arrow-batched ``mapInPandas`` over a binary
column (same shape as the media decode stages); the query oracle is a
roundtrip — page text equals the document's word-chunk — so the whole
synthesize→parse chain is verified bit-for-bit.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onnxtr_spark.corpus import WORDS_PER_PAGE

_ESC = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f", "(": "(", ")": ")", "\\": "\\"}


def _escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _unescape_pdf_string(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        i += 1
        if i >= len(s):
            break
        nxt = s[i]
        if nxt in _ESC:
            out.append(_ESC[nxt])
            i += 1
        elif nxt.isdigit():  # octal \d{1,3}
            j = i
            while j < len(s) and j - i < 3 and s[j].isdigit():
                j += 1
            out.append(chr(int(s[i:j], 8)))
            i = j
        else:  # unknown escape: PDF drops the backslash
            out.append(nxt)
            i += 1
    return "".join(out)


def _content_stream(text: str) -> bytes:
    """One page's content: a Tj for short text, a split TJ array for
    longer text (both showing operators exercised)."""
    if len(text) > 40:
        mid = len(text) // 2
        body = f"BT /F1 12 Tf 72 720 Td [({_escape_pdf_string(text[:mid])}) -10 ({_escape_pdf_string(text[mid:])})] TJ ET"
    else:
        body = f"BT /F1 12 Tf 72 720 Td ({_escape_pdf_string(text)}) Tj ET"
    return zlib.compress(body.encode("latin-1"), 6)


def encode_pdf(pages_text: list[str]) -> bytes:
    """Build a valid minimal PDF with one page per text."""
    n = max(1, len(pages_text))
    texts = pages_text or [""]
    objects: list[bytes] = []
    # 1: catalog, 2: pages, 3: font; pages at 4..4+n-1, contents after
    kids = " ".join(f"{4 + i} 0 R" for i in range(n))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i in range(n):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> /Contents {4 + n + i} 0 R >>"
            ).encode()
        )
    for t in texts:
        data = _content_stream(t)
        objects.append(
            f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode() + data + b"\nendstream"
        )

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for idx, obj in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{idx} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(buf)


# Streams are located via their dict's /Length (direct integers only;
# indirect-length streams unsupported) — delimiter-scanning for
# "endstream" is wrong because compressed data can end in 0x0D, which a
# \r?\n delimiter regex would silently eat.
_STREAM_HDR_RE = re.compile(rb"/Length (\d+)[^>]*>>\s*stream\r?\n")

# --- unsupported-document gate -------------------------------------------
# This parser handles FlateDecode content streams and Tj/TJ text only.
# Real-world PDFs carrying other stream filters (DCT/CCITT images, LZW,
# JBIG2, ...) or encryption would previously fall through to EMPTY page
# text — a silent data loss. The gate names the reason loudly; the
# multi-source facade uses the same token set JVM-side to route such
# docs to the rasterizer branch (a real pypdfium2 rasterizer handles
# them), so they are flagged or re-routed, never silently blank.


class UnsupportedPdfError(ValueError):
    """Raised for a PDF this content-stream parser cannot faithfully
    read (encryption or a non-Flate stream filter)."""


# filter names this parser cannot inflate (PDF 1.7 table 6) + /Encrypt
UNSUPPORTED_PDF_TOKENS = (
    b"/Encrypt",
    b"/DCTDecode",
    b"/CCITTFaxDecode",
    b"/LZWDecode",
    b"/JBIG2Decode",
    b"/JPXDecode",
    b"/ASCII85Decode",
    b"/ASCIIHexDecode",
    b"/RunLengthDecode",
    b"/Crypt",
)


def pdf_unsupported_reason(blob: bytes) -> str | None:
    """The first unsupported feature found, or None if parseable."""
    for tok in UNSUPPORTED_PDF_TOKENS:
        if tok in blob:
            return "encrypted" if tok == b"/Encrypt" else f"filter:{tok[1:].decode()}"
    return None
_SHOW_RE = re.compile(
    r"\(((?:[^()\\]|\\.)*)\)\s*Tj"  # (string) Tj
    r"|\[((?:[^\[\]\\]|\\.)*)\]\s*TJ",  # [ (s1) kern (s2) ... ] TJ
    re.DOTALL,
)
_TJ_PART_RE = re.compile(r"\(((?:[^()\\]|\\.)*)\)", re.DOTALL)


def decode_pdf_texts(blob: bytes) -> list[str]:
    """Per-page text of a PDF: inflate each content stream, evaluate Tj
    and TJ showing operators in order. Raises ``UnsupportedPdfError``
    (never returns silently-empty text) for encrypted PDFs or
    non-Flate stream filters — route those through the rasterizer
    branch (sources/reader.py does this automatically)."""
    reason = pdf_unsupported_reason(blob)
    if reason is not None:
        raise UnsupportedPdfError(
            f"PDF uses an unsupported feature ({reason}); the content-stream "
            "parser handles FlateDecode text only — route this document "
            "through the rasterizer branch (sources/rasterize.py)"
        )
    pages: list[str] = []
    for m in _STREAM_HDR_RE.finditer(blob):
        raw = blob[m.end() : m.end() + int(m.group(1))]
        try:
            content = zlib.decompress(raw).decode("latin-1")
        except zlib.error:
            content = raw.decode("latin-1")
        parts: list[str] = []
        for sm in _SHOW_RE.finditer(content):
            if sm.group(1) is not None:
                parts.append(_unescape_pdf_string(sm.group(1)))
            else:
                for pm in _TJ_PART_RE.finditer(sm.group(2)):
                    parts.append(_unescape_pdf_string(pm.group(1)))
        pages.append("".join(parts))
    return pages


PDF_SCHEMA = "doc_id string, pdf binary"
PDF_TEXT_SCHEMA = "doc_id string, page int, page_text string"


def synthesize_pdfs(documents: DataFrame) -> DataFrame:
    """(doc_id, pdf): a real PDF per document, one page per
    WORDS_PER_PAGE-word chunk (same pagination as the OCR corpus)."""
    base = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.split(F.trim("text"), r"\s+").alias("words"),
    )
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    base = base.repartition(parallelism)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, words in zip(pdf["doc_id"], pdf["words"]):
                words = [w for w in list(words) if w]
                chunks = [
                    " ".join(words[i : i + WORDS_PER_PAGE]) for i in range(0, len(words), WORDS_PER_PAGE)
                ] or [""]
                rows.append({"doc_id": doc_id, "pdf": encode_pdf(chunks)})
            yield pd.DataFrame(rows, columns=["doc_id", "pdf"])

    return base.mapInPandas(build, schema=PDF_SCHEMA)


def pdf_pages_text(pdfs: DataFrame) -> DataFrame:
    """(doc_id, page, page_text) from a (doc_id, pdf binary) table."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["pdf"]):
                for p, text in enumerate(decode_pdf_texts(bytes(blob))):
                    rows.append({"doc_id": doc_id, "page": p, "page_text": text})
            yield pd.DataFrame(rows, columns=["doc_id", "page", "page_text"])

    return pdfs.mapInPandas(parse, schema=PDF_TEXT_SCHEMA)


def pdf_extract_query(documents: DataFrame) -> DataFrame:
    """Roundtrip query: synthesize real PDFs → parse text back."""
    return pdf_pages_text(synthesize_pdfs(documents))


PDF_EXTRACT_SQL = f"""
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         string_split_regex(trim(text), '\\s+') AS words
  FROM documents
), pages AS (
  SELECT doc_id, words,
         unnest(generate_series(0, CAST(greatest(1, ceil(len(words) / {WORDS_PER_PAGE}.0)) AS INT) - 1)) AS p
  FROM w
)
SELECT doc_id, CAST(p AS INT) AS page,
       array_to_string(words[p * {WORDS_PER_PAGE} + 1 : (p + 1) * {WORDS_PER_PAGE}], ' ') AS page_text
FROM pages
"""
