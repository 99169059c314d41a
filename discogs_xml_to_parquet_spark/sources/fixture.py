"""Deterministic Discogs-shaped `releases` fixture (FIXTURES.md §B).

Covers every branch the reference handles: optional anv/join null paths
(main.rs:718-741), missing master_id (:557-560), &amp; unescape
(:596, 619), empty tags (:518-520), skipped subtrees (:758-917), and
unknown-attr-on-label tolerance (:662).
"""

from __future__ import annotations

import gzip
import os

RELEASES_XML = """<releases>
<release id="1" status="Accepted">
<title>First Album</title>
<artists><artist><id>10</id><name>Alpha &amp; Beta</name><anv>A&amp;B</anv><join>feat.</join><role></role><tracks></tracks></artist><artist><id>11</id><name>Gamma</name><anv></anv><join></join></artist></artists>
<genres><genre>Rock</genre><genre>R&amp;B</genre></genres>
<styles><style>Indie &amp; Alt</style></styles>
<labels><label id="100" catno="CAT-1" name="LabelOne"/><label id="101" catno="CAT-2" name="LabelTwo" extra="ignored"/></labels>
<master_id is_main_release="true">555</master_id>
<images><image uri="http://x/1.jpg"/></images>
<formats><format name="Vinyl"><descriptions><description>LP</description></descriptions></format></formats>
<country>UK</country>
<notes>free text to be skipped</notes>
</release>
<release id="2" status="Draft">
<title>Second</title>
<master_id is_main_release="false">556</master_id>
</release>
<release id="3" status="Deleted">
<title>Third</title>
<genres><genre>Jazz</genre></genres>
<dummy/>
</release>
</releases>
"""


def write_fixture_gz(path: str) -> str:
    """Write the fixture as .xml.gz (idempotent); returns the path."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with gzip.open(tmp, "wt", encoding="utf-8") as f:
            f.write(RELEASES_XML)
        os.replace(tmp, path)
    return path
