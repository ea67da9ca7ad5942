"""Admin CLI for snapshot-manifest tables (plans/snapstore.py).

Usage:
    python tools/snapshot_admin.py <table_root> log
    python tools/snapshot_admin.py <table_root> describe [version]
    python tools/snapshot_admin.py <table_root> show [version] [-n N]
    python tools/snapshot_admin.py <table_root> compact [partition_col]
    python tools/snapshot_admin.py <table_root> expire [keep_last]

`log` / `describe` are metadata-only (no Spark); `show` / `compact`
start a local session.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocrodjvu_spark.plans.snapstore import SnapshotTable  # noqa: E402


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2:
        print(__doc__)
        return 2
    root, cmd, args = argv[0], argv[1], argv[2:]
    t = SnapshotTable(root)

    if cmd == 'log':
        for v in t.versions():
            m = t.snapshot(v)
            rows = sum(f.get('rows', 0) for f in m['files'])
            tag = f" tag={m['tag']}" if m.get('tag') else ''
            print(f"v{v}  {m['operation']:<20} files={len(m['files']):>4} "
                  f"rows={rows:>10}{tag}")
        return 0

    if cmd == 'describe':
        version = int(args[0]) if args else None
        print(json.dumps(t.snapshot(version), indent=2))
        return 0

    from ocrodjvu_spark.session import get_spark
    spark = get_spark('snapshot-admin', cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel('ERROR')

    if cmd == 'show':
        version = int(args[0]) if args and args[0] != '-n' else None
        n = int(args[args.index('-n') + 1]) if '-n' in args else 20
        df = t.read(spark, version)
        if df is None:
            print('(empty table)')
            return 0
        df.show(n, truncate=40)
        print('rows:', df.count())
        return 0

    if cmd == 'compact':
        pcol = args[0] if args else None
        v = t.compact(spark, partition_col=pcol)
        print(f'compacted -> v{v} ({len(t.snapshot(v)["files"])} files)')
        return 0

    if cmd == 'expire':
        keep = int(args[0]) if args else 1
        deleted = t.expire_snapshots(keep_last=keep)
        print(f'expired: {len(deleted)} data files reclaimed; '
              f'versions kept: {t.versions()}')
        return 0

    print(f'unknown command: {cmd}')
    return 2


if __name__ == '__main__':
    raise SystemExit(main())
