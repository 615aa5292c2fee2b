"""CLI front-end: ``python -m fetchez_spark <cmd>``.

Mirrors the reference CLI's informational surface (--modules, --search,
--info, --list-hooks, --hook-info -- /root/reference/src/fetchez/
cli.py:532-635) plus recipe dispatch (cli.py:498-511) and dry-run.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="fetchez-spark",
        description="PySpark-native CDC / incremental-ingest engine",
    )
    from fetchez_spark import __version__

    parser.add_argument("--version", action="version", version=f"fetchez-spark {__version__}")
    sub = parser.add_subparsers(dest="cmd")

    sub.add_parser("sources", help="list registered change sources")
    sub.add_parser("sinks", help="list registered sinks")
    p = sub.add_parser("transforms", help="list registered transforms")
    p.add_argument("--stage", choices=["pre", "file", "post"])
    p = sub.add_parser("search", help="full-text search sources/sinks/transforms")
    p.add_argument("term")
    p = sub.add_parser("info", help="details for a source/sink/transform")
    p.add_argument("name")
    p = sub.add_parser("run", help="run a YAML/JSON recipe")
    p.add_argument("recipe")
    p.add_argument("--dry-run", action="store_true", help="plan only, commit nothing")

    args = parser.parse_args(argv)
    from fetchez_spark import registry
    from fetchez_spark.transforms import get_transform, list_transforms, search_transforms

    if args.cmd == "sources":
        for s in registry.list_sources():
            print(f"{s.name:16s} [{s.category}] {s.desc}")
        return 0
    if args.cmd == "sinks":
        for s in registry.list_sinks():
            print(f"{s.name:16s} [{s.category}] {s.desc}")
        return 0
    if args.cmd == "transforms":
        for t in list_transforms(stage=args.stage):
            print(f"{t.name:16s} [{t.stage}/{t.category}] {t.desc}")
        return 0
    if args.cmd == "search":
        for s in registry.search(args.term):
            print(f"{s.name:16s} {s.desc}")
        for t in search_transforms(args.term):
            print(f"{t.name:16s} (transform) {t.desc}")
        return 0
    if args.cmd == "info":
        s = registry.info(args.name)
        if s:
            print(json.dumps(s.__dict__, default=str, indent=2))
            return 0
        try:
            get_transform(args.name)
        except TypeError:
            pass  # factory needed args -- it exists
        except KeyError:
            print(f"unknown: {args.name}", file=sys.stderr)
            return 1
        t = next(x for x in list_transforms() if x.name == args.name)
        print(json.dumps({k: v for k, v in t.__dict__.items() if k != "factory"}, indent=2))
        return 0
    if args.cmd == "run":
        from fetchez_spark.recipe import Recipe

        result = Recipe.from_file(args.recipe).run(dry_run=args.dry_run)
        print(json.dumps(result, default=str)[:2000])
        return 0
    parser.print_help()
    return 0


if __name__ == "__main__":
    sys.exit(main())
