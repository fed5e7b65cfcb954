"""schema.org microdata extraction: value-resolution rules, nesting,
multi-token itemprop, sibling items, depth cap."""

from open_ocr_spark.kernels.microdata import extract_microdata


def test_value_resolution_rules():
    html = b"""<div itemscope itemtype="https://schema.org/Thing">
      <meta itemprop="m" content="from-content">
      <a itemprop="a" href="/link">text ignored</a>
      <img itemprop="i" src="/pic.png">
      <time itemprop="t" datetime="2024-01-02">Jan 2</time>
      <time itemprop="t2">Jan 3</time>
      <data itemprop="d" value="42">forty-two</data>
      <span itemprop="s">  spanned   text </span>
    </div>"""
    got = dict((p, v) for _, _, p, v in extract_microdata(html))
    assert got == {
        "m": "from-content", "a": "/link", "i": "/pic.png",
        "t": "2024-01-02", "t2": "Jan 3", "d": "42",
        "s": "spanned text",
    }


def test_skip_tag_media_props_declared_out_of_scope():
    # object/embed/video subtrees are dropped by the shared tree
    # builder; their itemprops must vanish silently, not crash
    html = (b'<div itemscope><object itemprop="o" data="/x"></object>'
            b'<span itemprop="s">kept</span></div>')
    assert [(p, v) for _, _, p, v in extract_microdata(html)] == [
        ("s", "kept")
    ]


def test_multi_token_itemprop():
    html = b'<div itemscope><span itemprop="name headline">X</span></div>'
    assert [(p, v) for _, _, p, v in extract_microdata(html)] == [
        ("name", "X"), ("headline", "X"),
    ]


def test_nested_item_flattens_dotted():
    html = b"""<div itemscope itemtype="https://schema.org/Article">
      <div itemprop="author" itemscope>
        <span itemprop="name">A</span>
        <div itemprop="address" itemscope>
          <span itemprop="city">B</span>
        </div>
      </div>
    </div>"""
    rows = extract_microdata(html)
    assert ("author.name", "A") in [(p, v) for _, _, p, v in rows]
    assert ("author.address.city", "B") in [(p, v) for _, _, p, v in rows]
    assert all(o == 0 for o, _, _, _ in rows)


def test_itemscope_without_itemprop_is_a_sibling_item():
    html = b"""<div itemscope itemtype="https://schema.org/A">
      <span itemprop="x">1</span>
      <div itemscope itemtype="https://schema.org/B">
        <span itemprop="y">2</span>
      </div>
    </div>"""
    rows = extract_microdata(html)
    assert (0, "https://schema.org/A", "x", "1") in rows
    assert (1, "https://schema.org/B", "y", "2") in rows
    # x must NOT absorb y
    assert not any(p == "y" and o == 0 for o, _, p, _ in rows)


def test_scalar_prop_element_can_contain_more_props():
    html = b"""<div itemscope>
      <div itemprop="outer">txt <span itemprop="inner">in</span></div>
    </div>"""
    props = [(p, v) for _, _, p, v in extract_microdata(html)]
    assert ("outer", "txt in") in props
    assert ("inner", "in") in props


def test_depth_cap_drops_not_raises():
    html = "<div itemscope>"
    for k in range(8):
        html += f'<div itemprop="p{k}" itemscope>'
    html += '<span itemprop="leaf">deep</span>' + "</div>" * 9
    rows = extract_microdata(html.encode())
    # nothing deeper than the cap, and no exception
    assert all(p.count(".") <= 5 for _, _, p, _ in rows)


def test_no_microdata_returns_empty():
    assert extract_microdata(b"<html><body><p>plain</p></body></html>") == []


def test_deep_tag_soup_is_total():
    # 5000-deep element nesting under an itemscope must not blow the
    # recursion limit — the walker is iterative
    html = ('<div itemscope>' + '<b>' * 5000
            + '<span itemprop="leaf">deep</span>'
            + '</b>' * 5000 + '</div>')
    rows = extract_microdata(html.encode())
    assert ("leaf", "deep") in [(p, v) for _, _, p, v in rows]
