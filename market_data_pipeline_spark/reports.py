"""Driver-side report rendering — Markdown from collected SMALL frames.

Reference parity: /root/reference/src/utils/report_generator.py:46-145
(markdown sections: summary counts, signal buckets, weekly top/bottom) and
:307-313 (recommendation counts). Rendering is the one legitimately
driver-side stage: inputs are the tiny final frames (one row per symbol or
per bucket), never raw data — the ``collect()`` here is O(universe), not
O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md_table(rows: list[dict], cols: list[str]) -> str:
    head = "| " + " | ".join(cols) + " |"
    sep = "|" + "|".join(["---"] * len(cols)) + "|"
    body = [
        "| " + " | ".join("" if r.get(c) is None else str(r.get(c)) for c in cols) + " |"
        for r in rows
    ]
    return "\n".join([head, sep, *body])


def signal_report_markdown(signals: DataFrame, top_n: int = 5) -> str:
    """The daily signal report: recommendation counts + strongest buys and
    sells by confidence (report_generator.py:46-145 structure)."""
    counts = (
        signals.groupBy("overall_signal").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    buys = (
        signals.filter(F.col("overall_signal") == "buy")
        .orderBy(F.col("confidence").desc(), F.col("symbol"))
        .limit(top_n)
        .select("symbol", "close", "score", "confidence")
        .collect()
    )
    sells = (
        signals.filter(F.col("overall_signal") == "sell")
        .orderBy(F.col("confidence").desc(), F.col("symbol"))
        .limit(top_n)
        .select("symbol", "close", "score", "confidence")
        .collect()
    )
    parts = [
        "# Daily Signal Report",
        "",
        "## Recommendation counts",
        "",
        _md_table([r.asDict() for r in counts], ["overall_signal", "n"]),
        "",
        f"## Top {top_n} buys",
        "",
        _md_table([r.asDict() for r in buys], ["symbol", "close", "score", "confidence"]),
        "",
        f"## Top {top_n} sells",
        "",
        _md_table([r.asDict() for r in sells], ["symbol", "close", "score", "confidence"]),
        "",
    ]
    return "\n".join(parts)


def markdown_to_html(md: str, title: str = "Report") -> str:
    """S20 HTML twin (report_generator.py:35 promises "Markdown/HTML"; only
    the .md side exists in the reference — this completes the pair).

    Minimal renderer for the two shapes our reports emit — headings and
    pipe-tables — so the HTML sink needs no external converter library.
    """
    import html as _html

    out: list[str] = []
    lines = md.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("|") and i + 1 < len(lines) and set(lines[i + 1]) <= set("|-: "):
            cells = [c.strip() for c in line.strip("|").split("|")]
            out.append("<table><thead><tr>")
            out.extend(f"<th>{_html.escape(c)}</th>" for c in cells)
            out.append("</tr></thead><tbody>")
            i += 2
            while i < len(lines) and lines[i].startswith("|"):
                row = [c.strip() for c in lines[i].strip("|").split("|")]
                out.append("<tr>" + "".join(f"<td>{_html.escape(c)}</td>" for c in row) + "</tr>")
                i += 1
            out.append("</tbody></table>")
            continue
        if line.startswith("#"):
            level = len(line) - len(line.lstrip("#"))
            out.append(f"<h{level}>{_html.escape(line[level:].strip())}</h{level}>")
        elif line.strip():
            out.append(f"<p>{_html.escape(line)}</p>")
        i += 1
    body = "\n".join(out)
    return (
        f"<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title></head><body>\n{body}\n</body></html>"
    )


def markdown_to_pdf(md: str, path: str, title: str = "Report") -> int:
    """S20 PDF twin (reference scripts/export_report.py:48-96 renders
    MD/HTML/PDF; this completes the trio) — a dependency-free text PDF.

    Emits a valid PDF 1.4 by hand: catalog → pages → one page object per
    ~54 lines with an uncompressed text content stream (Helvetica, WinAnsi).
    Headings render larger/bold-ish (size bump); table pipes render as
    aligned text. Characters outside Latin-1 are replaced (the base-14
    fonts have no wider encoding — a real deployment would embed a font;
    the structure is identical). Returns the number of pages written.

    Driver-side by nature, like every report sink here: the input is the
    already-rendered markdown of a collected O(universe) frame.
    """
    lines = md.splitlines()
    pages: list[list[tuple[int, str]]] = [[]]
    # Paginate by the cumulative leading actually consumed, not a fixed line
    # count: headings raise the leading to int(size*1.3) (up to 23pt), so a
    # heading-heavy page at 54 fixed lines would draw below y=0 and lose
    # content off the page bottom. Baselines start at y=756; break before a
    # line's baseline would land under the 36pt bottom margin.
    top_y, bottom_y = 756, 36
    y = top_y
    for raw in lines:
        size = 11
        txt = raw
        if raw.startswith("## "):
            size, txt = 14, raw[3:]
        elif raw.startswith("# "):
            size, txt = 18, raw[2:]
        if y < bottom_y and pages[-1]:
            pages.append([])
            y = top_y
        pages[-1].append((size, txt))
        y -= int(size * 1.3)

    def esc(s: str) -> bytes:
        b = s.encode("latin-1", errors="replace")
        return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")

    objs: list[bytes] = []  # 1-indexed PDF objects, in order
    page_count = len(pages)
    # object layout: 1 catalog, 2 pages, 3 font, then per page i:
    # 4+2i page object, 5+2i content stream
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(page_count))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {page_count} >>".encode()
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
    )
    for i, page in enumerate(pages):
        content = bytearray(b"BT\n/F1 11 Tf\n1 0 0 1 72 756 Tm\n14 TL\n")
        cur_size = 11
        for size, txt in page:
            if size != cur_size:
                content += f"/F1 {size} Tf\n{int(size * 1.3)} TL\n".encode()
                cur_size = size
            content += b"(" + esc(txt) + b") Tj\nT*\n"
        content += b"ET"
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>".encode()
        )
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), bytes(content))
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return page_count


def quality_report_markdown(report: DataFrame, worst_n: int = 10) -> str:
    """Data-quality section: worst symbols by quality score
    (pipeline.py:377-406 outputs)."""
    worst = (
        report.orderBy(F.col("quality_score").asc(), F.col("symbol"))
        .limit(worst_n)
        .select("symbol", "n_rows", "missing_days", "dup_times", "quality_score")
        .collect()
    )
    return "\n".join(
        [
            "# Data Quality Report",
            "",
            f"## Worst {worst_n} symbols",
            "",
            _md_table(
                [r.asDict() for r in worst],
                ["symbol", "n_rows", "missing_days", "dup_times", "quality_score"],
            ),
            "",
        ]
    )
