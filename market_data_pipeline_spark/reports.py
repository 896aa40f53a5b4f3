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
