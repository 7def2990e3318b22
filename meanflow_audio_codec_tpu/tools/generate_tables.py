"""Paper-table generation (reference: meanflow_audio_codec/tools/
generate_tables.py:43-91+): renders the experiment tables — main results,
method ablation, architecture ablation, tokenization comparison, NFE sweep,
size scaling, LR sweep, gamma sweep — in LaTeX, Markdown, CSV and HTML."""

from __future__ import annotations

import argparse
from pathlib import Path

from meanflow_audio_codec_tpu.tools.aggregate_results import (
    group_stats,
    load_rows,
)

FORMATS = ("latex", "markdown", "csv", "html")

#: (table name, group keys, filter predicate on raw rows)
TABLE_SPECS: dict[str, tuple[tuple[str, ...], str]] = {
    "main_results": (("method", "architecture"), "main results"),
    "method_ablation": (("method",), "objective comparison"),
    "architecture_ablation": (("architecture",), "architecture comparison"),
    "tokenization_comparison": (("tokenization",), "tokenizer comparison"),
    "nfe_sweep": (("method", "nfe"), "quality vs sampling steps"),
    "dataset_breakdown": (("dataset", "method"), "per-dataset results"),
    "speed": (("method", "nfe"), "inference latency"),
    "size_scaling": (("architecture", "param_count"), "model size scaling"),
}


def _format_value(value) -> str:
    if isinstance(value, float):
        return f"{value:.4g}"
    return str(value)


def render_table(rows: list[dict], fmt: str, caption: str = "") -> str:
    if not rows:
        return ""
    keys = sorted({k for row in rows for k in row})
    cells = [[_format_value(row.get(k, "")) for k in keys] for row in rows]

    if fmt == "csv":
        lines = [",".join(keys)]
        lines += [",".join(row) for row in cells]
        return "\n".join(lines) + "\n"
    if fmt == "markdown":
        lines = ["| " + " | ".join(keys) + " |",
                 "|" + "|".join("---" for _ in keys) + "|"]
        lines += ["| " + " | ".join(row) + " |" for row in cells]
        return "\n".join(lines) + "\n"
    if fmt == "latex":
        header = " & ".join(k.replace("_", r"\_") for k in keys)
        lines = [r"\begin{table}[h]", r"\centering",
                 rf"\caption{{{caption}}}",
                 r"\begin{tabular}{" + "l" * len(keys) + "}",
                 r"\toprule", header + r" \\", r"\midrule"]
        lines += [" & ".join(row) + r" \\" for row in cells]
        lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}"]
        return "\n".join(lines) + "\n"
    if fmt == "html":
        head = "".join(f"<th>{k}</th>" for k in keys)
        body = "".join(
            "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
            for row in cells)
        return (f"<table>\n<caption>{caption}</caption>\n"
                f"<thead><tr>{head}</tr></thead>\n"
                f"<tbody>{body}</tbody>\n</table>\n")
    raise ValueError(f"Unknown format {fmt!r}; expected one of {FORMATS}")


def generate_tables(metrics_csv: Path | str, out_dir: Path | str,
                    formats: tuple[str, ...] = FORMATS) -> list[Path]:
    rows = load_rows(metrics_csv)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    extension = {"latex": "tex", "markdown": "md", "csv": "csv",
                 "html": "html"}
    written = []
    for name, (group_keys, caption) in TABLE_SPECS.items():
        available = [k for k in group_keys
                     if any(k in row for row in rows)]
        if not available:
            continue
        summary = group_stats(rows, tuple(available))
        for fmt in formats:
            text = render_table(summary, fmt, caption=caption)
            if not text:
                continue
            path = out_dir / f"{name}.{extension[fmt]}"
            path.write_text(text)
            written.append(path)
    return written


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Generate paper tables")
    parser.add_argument("--csv", type=Path, default=Path("metrics.csv"))
    parser.add_argument("--out-dir", type=Path, default=Path("tables"))
    parser.add_argument("--formats", nargs="+", default=list(FORMATS),
                        choices=list(FORMATS))
    args = parser.parse_args(argv)
    written = generate_tables(args.csv, args.out_dir, tuple(args.formats))
    print(f"Wrote {len(written)} tables to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
