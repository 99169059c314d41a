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


_GENRES = ["Rock", "Jazz", "Electronic", "Folk, World, &amp; Country", "Hip Hop"]
_STYLES = ["Indie", "Ambient", "House", "Punk", "R&amp;B"]
_STATUSES = ["Accepted", "Draft", "Deleted"]


def _release_xml(i: int) -> str:
    """One synthetic release exercising the reference's branch space by
    residue class: i%3 status, i%4==0 absent master_id (main.rs:557-560
    null default), i%7==0 no genres/styles (empty non-null arrays),
    i%11==0 no artists, i%2 anv empty->null (main.rs:721-728), i%6==0
    unknown label attr (silently ignored, main.rs:662), i%5==0 extra
    skipped subtrees (main.rs:758-917)."""
    status = _STATUSES[i % 3]
    parts = [f'<release id="{i}" status="{status}">\n']
    parts.append(f"<title>Release {i} &amp; Friends</title>\n")
    if i % 11 != 0:
        parts.append("<artists>")
        for a in range(1 + i % 3):
            anv = f"<anv>AKA {i}-{a}</anv>" if a % 2 == 0 else "<anv></anv>"
            parts.append(
                f"<artist><id>{i * 10 + a}</id><name>Artist {i}-{a}</name>"
                f"{anv}<join>,</join><role></role><tracks></tracks></artist>"
            )
        parts.append("</artists>\n")
    if i % 7 != 0:
        parts.append(
            f"<genres><genre>{_GENRES[i % len(_GENRES)]}</genre></genres>\n"
            f"<styles><style>{_STYLES[i % len(_STYLES)]}</style></styles>\n"
        )
    extra_attr = ' ignored_attr="zzz"' if i % 6 == 0 else ""
    parts.append(
        "<labels>"
        + "".join(
            f'<label id="{i * 100 + l}" catno="CAT-{i}-{l}" name="Label {l}"{extra_attr}/>'
            for l in range(1 + i % 2)
        )
        + "</labels>\n"
    )
    if i % 4 != 0:  # absent master_id every 4th release
        flag = "true" if i % 2 == 0 else "false"
        parts.append(f'<master_id is_main_release="{flag}">{i + 7}</master_id>\n')
    if i % 5 == 0:
        parts.append(
            f'<images><image uri="http://x/{i}.jpg"/></images>\n'
            "<formats><format name=\"Vinyl\"><descriptions>"
            "<description>LP</description></descriptions></format></formats>\n"
            f"<tracklist><track><title>T{i}</title></track></tracklist>\n"
        )
    parts.append(f"<country>Country {i % 20}</country>\n")
    parts.append(f"<notes>notes for release {i}</notes>\n")
    parts.append("</release>\n")
    return "".join(parts)


def expected_flat_rows(n_releases: int = 150,
                       start_id: int = 1001) -> list[tuple]:
    """Ground-truth flattened rows (id, status, title, n_artists,
    n_null_anv, n_genres, n_styles, n_labels, is_main_release,
    master_id) for the edge fixture + synthetic corpus, computed
    DIRECTLY from the residue-class generator rules above -- no XML
    parsing, no Spark. This is the independent oracle side of the
    conversion correctness check (VERDICT r3 item 5): if the engine's
    XML->DataFrame path diverges from these rows on any branch, the
    driver hash breaks."""
    rows = [
        # mirrors RELEASES_XML verbatim (anv=''-> null on artist 11;
        # &amp; unescaped in title/genre/style; release 3 has no
        # master_id -> both columns null)
        (1, "Accepted", "First Album", 2, 1, 2, 1, 2, True, 555),
        (2, "Draft", "Second", 0, 0, 0, 0, 0, False, 556),
        (3, "Deleted", "Third", 0, 0, 1, 0, 0, None, None),
    ]
    for i in range(start_id, start_id + n_releases):
        if i % 11 != 0:
            n_art = 1 + i % 3
            # odd artist index -> <anv></anv> -> empty -> null
            n_null_anv = n_art // 2
        else:
            n_art, n_null_anv = 0, 0
        has_taxonomy = 1 if i % 7 != 0 else 0
        if i % 4 != 0:
            master_id, is_main = i + 7, i % 2 == 0
        else:
            master_id, is_main = None, None
        rows.append((
            i, _STATUSES[i % 3], f"Release {i} & Friends",
            n_art, n_null_anv, has_taxonomy, has_taxonomy, 1 + i % 2,
            is_main, master_id,
        ))
    return rows


# Per-artist ground truth for the edge fixture (releases 2 and 3 have
# no artists): (release_id, title, artist_id, name, anv, join). The
# artist struct keeps id as string (the reference projects it
# verbatim, main.rs:670-756).
EXPECTED_ARTIST_ROWS: list[tuple] = [
    (1, "First Album", "10", "Alpha & Beta", "A&B", "feat."),
    (1, "First Album", "11", "Gamma", None, None),
]


def _write_parquet_atomic(path: str, table) -> str:
    """Single-file parquet write (pyarrow), atomic against concurrent
    writers/readers via tmp+rename. Always rewrites (unlike the XML
    fixtures) so a stale expected file from an older generator version
    can never shadow the current ground truth; the write happens once
    per process at import and the table is tiny."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def write_expected_flat_parquet(path: str) -> str:
    """Write expected_flat_rows() as parquet for the DuckDB oracle's
    read_parquet(); int64/bool/string schema (driver hash collapses
    integer widths, so int64 matches Spark's int-sized size() counts)."""
    import pyarrow as pa

    cols = list(zip(*expected_flat_rows()))
    names = ["id", "status", "title", "n_artists", "n_null_anv",
             "n_genres", "n_styles", "n_labels", "is_main_release",
             "master_id"]
    types = [pa.int64(), pa.string(), pa.string(), pa.int64(),
             pa.int64(), pa.int64(), pa.int64(), pa.int64(),
             pa.bool_(), pa.int64()]
    table = pa.table(
        {n: pa.array(c, type=t) for n, c, t in zip(names, cols, types)}
    )
    return _write_parquet_atomic(path, table)


def write_expected_artists_parquet(path: str) -> str:
    """Write EXPECTED_ARTIST_ROWS as parquet for the explode oracle."""
    import pyarrow as pa

    cols = list(zip(*EXPECTED_ARTIST_ROWS))
    names = ["release_id", "title", "artist_id", "name", "anv", "join"]
    types = [pa.int64()] + [pa.string()] * 5
    table = pa.table(
        {n: pa.array(c, type=t) for n, c, t in zip(names, cols, types)}
    )
    return _write_parquet_atomic(path, table)


def write_synthetic_releases(dir_path: str, n_releases: int,
                             n_files: int = 4, start_id: int = 1) -> str:
    """Deterministic n_releases-row Discogs-shaped corpus split over
    n_files .xml.gz files (idempotent). Exercises every parse branch at
    volume; one scan task per file, like the reference x N processes.

    Returns a params-keyed SUBDIRECTORY of dir_path. The corpus is
    built in a unique temp dir and atomically renamed into place, so a
    concurrent reader (parallel pytest worker, second driver) can never
    glob a partially-written or mixed-parameter corpus (ADVICE r2); a
    losing concurrent writer discards its build and reads the winner's.
    """
    import shutil
    import tempfile as _tempfile

    corpus = os.path.join(
        dir_path, f"n{n_releases}-f{n_files}-s{start_id}"
    )
    if os.path.isdir(corpus):
        return corpus
    os.makedirs(dir_path, exist_ok=True)
    build = _tempfile.mkdtemp(dir=dir_path, prefix=".build-")
    per = n_releases // n_files
    rid = start_id
    for f_no in range(n_files):
        count = per if f_no < n_files - 1 else n_releases - per * (n_files - 1)
        fp = os.path.join(build, f"releases-{f_no}.xml.gz")
        with gzip.open(fp, "wt", encoding="utf-8") as f:
            f.write("<releases>\n")
            for _ in range(count):
                f.write(_release_xml(rid))
                rid += 1
            f.write("</releases>\n")
    try:
        os.rename(build, corpus)  # atomic publish; fails if target exists
    except OSError:
        shutil.rmtree(build, ignore_errors=True)  # lost the race
    return corpus
