"""hreflang edges and variant clusters."""

from open_ocr_spark.dataops.hreflang import hreflang_clusters, hreflang_edges

_PAGE = (
    '<html><head>'
    '<link rel="alternate" hreflang="en" href="https://s/en/p">'
    '<link rel="alternate" hreflang="fr" href="https://s/fr/p">'
    '<link rel="alternate" hreflang="x-default" href="https://s/en/p">'
    '<link rel="stylesheet" href="/css">'
    '</head><body>x</body></html>'
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, html_str string")


def test_edges(spark):
    got = {(r.lang, r.href) for r in
           hreflang_edges(_df(spark, [("https://s/fr/p", _PAGE)])).collect()}
    assert got == {
        ("en", "https://s/en/p"), ("fr", "https://s/fr/p"),
        ("x-default", "https://s/en/p"),
    }


def test_cluster_key_follows_x_default(spark):
    r = hreflang_clusters(_df(spark, [("https://s/fr/p", _PAGE)])).collect()[0]
    assert r.cluster_key == "https://s/en/p"
    assert r.n_alternates == 2
    assert r.langs == "en,fr"


def test_cluster_key_min_of_clique_without_x_default(spark):
    page = ('<link rel="alternate" hreflang="fr" href="https://s/fr/p">'
            '<link rel="alternate" hreflang="de" href="https://s/de/p">')
    r = hreflang_clusters(_df(spark, [("https://s/zz/p", page)])).collect()[0]
    # min over alternates and the page's own url
    assert r.cluster_key == "https://s/de/p"


def test_own_url_can_be_the_key(spark):
    page = '<link rel="alternate" hreflang="fr" href="https://s/zz/p">'
    r = hreflang_clusters(_df(spark, [("https://s/aa/p", page)])).collect()[0]
    assert r.cluster_key == "https://s/aa/p"


def test_pages_without_hreflang_emit_nothing(spark):
    df = _df(spark, [("https://s/x", "<html><body>plain</body></html>")])
    assert hreflang_clusters(df).count() == 0
