"""Document sources beyond page images: HTML (boilerplate strip) and
PDF (content-stream text parse) — the north-rule's "HTML boilerplate
strip, PDF/layout parse, DOM heuristics" surface (reference S1/S3:
io/pdf.py, io/html.py)."""
