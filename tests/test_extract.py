"""Per-url byte-identical extraction invariant (BASELINE.json input_hint; M14)."""

from registry_address_matcher_ray.functions.extract import extract_text
from registry_address_matcher_ray.sources import synth


def test_extract_invariant_on_pages():
    t = synth.synth_registries(300, seed=21)
    pages = synth.synth_pages(t["registry_spr"], seed=21)
    htmls = pages.column("html").to_pylist()
    texts = pages.column("text").to_pylist()
    assert len(htmls) > 300
    for h, txt in zip(htmls, texts):
        assert extract_text(h) == txt  # byte-identical per url


def test_extract_deterministic_and_robust():
    html = b"<html><head><title>t</title><script>1<2</script></head>" \
           b"<body><p>a &amp; b</p><div>c</div><!-- x --></body></html>"
    assert extract_text(html) == extract_text(html) == "a & b\nc"
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"no tags at all") == "no tags at all"
    # invalid utf-8 must not raise, and must be stable
    junk = b"<p>\xff\xfe ok</p>"
    assert extract_text(junk) == extract_text(junk)


def test_addr_line_round_trip():
    line = synth.format_addr_line("SPR-000001", "Աբովյան", None, "")
    parsed = synth.parse_addr_line(line)
    assert parsed == ("SPR-000001", "Աբովյան", None, "")
    assert synth.parse_addr_line("not an addr line") is None
