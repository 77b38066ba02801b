"""HTML table scan tests (sources/html.py — SURVEY S1, the kworb seed
scrape re-expressed as a Catalyst-only tabular source)."""

from __future__ import annotations

from spotify_data_pipeline_spark.sources.html import scan_html_table

_HTML = """<html><body>
<table id="other"><tr><td>nope</td><td>wrong table</td></tr></table>
<table class="x" id="artistsext">
  <tr><th>#</th><th>Artist</th><th>Streams</th></tr>
  <tr><td>1</td><td><a href="/a">Artist  One</a></td><td>123</td></tr>
  <tr><td>2</td><td><b>Artist
  Two</b></td><td>456</td></tr>
  <tr><td>3</td><td>Plain Three</td><td>789</td></tr>
</table>
</body></html>"""


def test_scan_html_table_extracts_column(spark, tmp_path):
    p = tmp_path / "page.html"
    p.write_text(_HTML)
    out = scan_html_table(spark, str(p), table_id="artistsext", column_index=1,
                          column_name="artist_name")
    names = sorted(r.artist_name for r in out.collect())
    # header (th-only) row dropped; tags stripped; whitespace normalized;
    # the other table untouched
    assert names == ["Artist One", "Artist Two", "Plain Three"]


def test_scan_html_table_missing_table_yields_empty(spark, tmp_path):
    p = tmp_path / "empty.html"
    p.write_text("<html><table id='nope'><tr><td>x</td></tr></table></html>")
    out = scan_html_table(spark, str(p), table_id="artistsext")
    assert out.count() == 0
