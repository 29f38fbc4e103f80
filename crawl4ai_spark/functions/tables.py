"""Table extraction — ``DefaultTableExtraction`` parity over DOM-lite
(reference ``table_extraction.py:66-297``).

The reference scores every ``<table>`` to separate data tables from
layout tables (thead/tbody/th structure, column-count consistency,
caption/summary, text density, size), then extracts headers (colspan-
expanded), body rows (``td`` only, rows outside ``thead``), caption,
summary and metadata, aligning rows to the header width.  All of it is
deterministic DOM arithmetic, reproduced here 1:1 on
``functions/html_dom.py`` nodes; ``LLMTableExtraction`` needs a model
and stays out of scope, ``NoTableExtraction`` is trivially ``None``.

Spark surface: tables ride the ``scraped.media.tables`` struct of
functions/scrape.py's single-pass page UDF (pass
``table_extraction=DefaultTableExtraction(...)`` — or ``True`` for
defaults — through the scrape options), so extraction costs no extra
parse and no extra Python crossing.
"""

from __future__ import annotations

from crawl4ai_spark.functions.html_dom import Node


class DefaultTableExtraction:
    """table_extraction.py:66-110 constructor surface."""

    def __init__(
        self,
        table_score_threshold: int = 7,
        min_rows: int = 0,
        min_cols: int = 0,
        **_: object,
    ):
        self.table_score_threshold = table_score_threshold
        self.min_rows = min_rows
        self.min_cols = min_cols

    # -- public API ----------------------------------------------------------

    def extract_tables(self, root: Node) -> list[dict]:
        out = []
        for table in root.iter("table"):
            if not self.is_data_table(table):
                continue
            try:
                data = self.extract_table_data(table)
            except Exception:
                continue  # reference logs and skips (:126-128)
            if self.min_rows > 0 and len(data["rows"]) < self.min_rows:
                continue
            if self.min_cols > 0:
                col_count = len(data["headers"]) or (
                    max((len(r) for r in data["rows"]), default=0)
                )
                if col_count < self.min_cols:
                    continue
            out.append(data)
        return out

    # -- scoring (:132-210) --------------------------------------------------

    def is_data_table(self, table: Node) -> bool:
        score = 0.0
        has_thead = next(iter(table.iter("thead")), None) is not None
        has_tbody = next(iter(table.iter("tbody")), None) is not None
        if has_thead:
            score += 2
        if has_tbody:
            score += 1
        th_count = sum(1 for _ in table.iter("th"))
        if th_count > 0:
            score += 2
            if has_thead or self._first_tr_has_th(table):
                score += 1
        if next(iter(table.iter("table")), None) is not None:
            score -= 3  # nested table
        if (table.get("role") or "").lower() in ("presentation", "none"):
            score -= 3
        rows = list(table.iter("tr"))
        if not rows:
            return False
        col_counts = [
            sum(1 for _ in r.iter("td")) + sum(1 for _ in r.iter("th"))
            for r in rows
        ]
        if col_counts:
            avg = sum(col_counts) / len(col_counts)
            variance = sum((c - avg) ** 2 for c in col_counts) / len(
                col_counts
            )
            if variance < 1:
                score += 2
        if next(iter(table.iter("caption")), None) is not None:
            score += 2
        if table.get("summary"):
            score += 1
        total_text = sum(
            len(cell.text_content().strip())
            for r in rows
            for cell in list(r.iter("td")) + list(r.iter("th"))
        )
        total_tags = sum(1 for _ in table.iter())
        text_ratio = total_text / (total_tags + 1e-5)
        if text_ratio > 20:
            score += 3
        elif text_ratio > 10:
            score += 2
        score += 0.5 * sum(
            1 for a in table.attrs if a.startswith("data-")
        )
        if col_counts and len(rows) >= 2:
            if sum(col_counts) / len(col_counts) >= 2:
                score += 2
        return score >= self.table_score_threshold

    @staticmethod
    def _first_tr_has_th(table: Node) -> bool:
        first_tr = next(iter(table.iter("tr")), None)
        if first_tr is None:
            return False
        return next(iter(first_tr.iter("th")), None) is not None

    # -- extraction (:215-297) -----------------------------------------------

    def extract_table_data(self, table: Node) -> dict:
        caption = ""
        cap = next(iter(table.iter("caption")), None)
        if cap is not None and cap.text:
            caption = cap.text.strip()
        summary = (table.get("summary") or "").strip()

        headers: list[str] = []
        thead = next(iter(table.iter("thead")), None)
        thead_tr = (
            next(iter(thead.iter("tr")), None) if thead is not None else None
        )
        if thead_tr is not None:
            for cell in thead_tr.iter("th"):
                text = cell.text_content().strip()
                headers.extend([text] * int(cell.get("colspan", 1)))
        else:
            first_tr = next(iter(table.iter("tr")), None)
            if first_tr is not None:
                for cell in first_tr.iter("th", "td"):
                    text = cell.text_content().strip()
                    headers.extend([text] * int(cell.get("colspan", 1)))

        rows: list[list[str]] = []
        for tr in table.iter("tr"):
            if any(a.tag == "thead" for a in tr.ancestors()):
                continue
            row_data: list[str] = []
            for cell in tr.iter("td"):
                text = cell.text_content().strip()
                row_data.extend([text] * int(cell.get("colspan", 1)))
            if row_data:
                rows.append(row_data)

        max_columns = len(headers) if headers else (
            max((len(r) for r in rows), default=0)
        )
        aligned = [
            r[:max_columns] + [""] * (max_columns - len(r)) for r in rows
        ]
        if not headers and max_columns > 0:
            headers = [f"Column {i + 1}" for i in range(max_columns)]

        metadata: dict = {
            "row_count": len(aligned),
            "column_count": max_columns,
            "has_headers": thead_tr is not None
            or self._first_tr_has_th(table),
            "has_caption": bool(caption),
            "has_summary": bool(summary),
        }
        if table.get("id"):
            metadata["id"] = table.get("id")
        if table.get("class"):
            metadata["class"] = table.get("class")
        return {
            "headers": headers,
            "rows": aligned,
            "caption": caption,
            "summary": summary,
            "metadata": metadata,
        }
