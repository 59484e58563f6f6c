"""S4 multi-source facade: one mixed-kind table routed to the right
decode path per kind (reference io/reader.py:21-79)."""

import pandas as pd

from onnxtr_spark import imaging
from onnxtr_spark.sources.pdf import encode_pdf
from onnxtr_spark.sources.reader import read_documents


def test_mixed_corpus_routes_per_kind(spark):
    html_payload = (
        "<html><head><script>x&&1</script></head><body><nav><p>junk</p></nav>"
        "<main><p>web words here</p></main><footer>f</footer></body></html>"
    ).encode()
    pdf_payload = encode_pdf(["pdf page one", "pdf page two"])
    img = imaging.render_page([["scanned", "words"]])
    img_payload = imaging.encode_image(img)

    img2 = imaging.render_page([["second", "page"]])
    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": ["h1", "p1", "i1", "i1"],
            "kind": ["html", "pdf", "image", "image"],
            "page": [0, 0, 0, 1],
            "payload": [html_payload, pdf_payload, img_payload, imaging.encode_image(img2)],
        })
    )
    out = read_documents(df).toPandas().sort_values(["doc_id", "page"]).reset_index(drop=True)
    rows = {(r.doc_id, r.page): (r.kind, r.text) for r in out.itertuples()}
    assert rows[("h1", 0)] == ("html", "web words here")
    assert rows[("p1", 0)] == ("pdf", "pdf page one")
    assert rows[("p1", 1)] == ("pdf", "pdf page two")
    assert rows[("i1", 0)] == ("image", "scanned words")
    assert rows[("i1", 1)] == ("image", "second page")
    assert len(out) == 5
