"""Metadata-plane benchmark for the snapshot table format.

Quantifies the manifest-list amortization (Iceberg spec, "Manifest
lists") against the former single-JSON ceiling: builds a 10,000-file /
64-partition table from synthetic entries (driver-side only — data
files never touched, this measures the METADATA plane), then times

  - snapshot() load (manifest-list resolve + all manifest files)
  - stats prune over all entries
  - metadata-only count_rows (list aggregates; zero manifest reads)
  - +10-file incremental commit into ONE partition — the headline:
    O(touched partition), formerly O(all files)

Usage: python tools/bench_manifest.py [n_files] [n_parts]
Prints one JSON line.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ocrodjvu_spark.plans.snapstore import SnapshotTable, file_may_match


def synth_entries(n, n_parts, tag):
    # RANGE-correlated partitions (a clustered table): partition k
    # holds the k-th doc_id slice, so manifest-level bounds are tight
    return [
        {'path': f'data/{tag}-{i}.parquet',
         'partition': str(i * n_parts // n),
         'rows': 1000,
         'stats': {'doc_id': [i * 1000, (i + 1) * 1000],
                   'score': [0.0, 1.0]}}
        for i in range(n)
    ]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    root = tempfile.mkdtemp(prefix='snapbench-')
    t = SnapshotTable(root)
    schema = json.dumps({'type': 'struct', 'fields': []})

    entries = synth_entries(n, n_parts, 'base')
    t0 = time.time()
    t._commit('append', entries, schema,
              apply=lambda base: base + entries)
    full_commit_s = time.time() - t0

    mf_bytes = sum(
        os.path.getsize(os.path.join(root, m['path']))
        for m in t._snapshot_doc()['manifest_list'])
    snap_bytes = os.path.getsize(
        os.path.join(t.manifest_dir, 'v1.json'))

    fresh = SnapshotTable(root)
    t0 = time.time()
    snap = fresh.snapshot()
    load_s = time.time() - t0
    assert len(snap['files']) == n

    t0 = time.time()
    kept = [f for f in snap['files']
            if file_may_match(f, [('doc_id', '>=', (n - n // 100)
                                   * 1000)])]
    prune_s = time.time() - t0

    # list-level stats pruning: manifests whose aggregated bounds
    # disprove the filter are skipped WITHOUT loading (fresh handle,
    # cold cache — measures planning cost, not file reads)
    lister = SnapshotTable(root)
    flt = [('doc_id', '>=', (n - n // 100) * 1000)]
    t0 = time.time()
    doc_l = lister._snapshot_doc()
    kept_mfs = [m for m in doc_l['manifest_list']
                if not m.get('stats')
                or file_may_match({'stats': m['stats']}, flt)]
    survivors = []
    for m in kept_mfs:
        survivors += [e for e in lister._load_manifest_file(m['path'])
                      if file_may_match(e, flt)]
    list_prune_s = time.time() - t0

    counter = SnapshotTable(root)
    t0 = time.time()
    total = counter.count_rows()
    one_part = counter.count_rows(partition_values=['7'])
    count_s = time.time() - t0
    assert total == n * 1000

    inc = synth_entries(10, 1, 'inc')
    for e in inc:
        e['partition'] = '7'
    t0 = time.time()
    # list_op='append' is what the public append() passes: the commit
    # never materializes the base file list
    t._commit('append', inc, schema, apply=lambda base: base + inc,
              list_op='append')
    inc_commit_s = time.time() - t0
    head = t._snapshot_doc()
    carried = sum(1 for m in head['manifest_list']
                  if m['path'] in {x['path'] for x in
                                   t._snapshot_doc(1)['manifest_list']})

    print(json.dumps({
        'n_files': n, 'n_parts': n_parts,
        'manifest_files_bytes': mf_bytes,
        'snapshot_doc_bytes': snap_bytes,
        'snapshot_load_sec': round(load_s, 4),
        'stats_prune_sec': round(prune_s, 4),
        'pruned_kept': len(kept),
        'list_level_prune_sec': round(list_prune_s, 4),
        'list_level_manifests_loaded': len(kept_mfs),
        'list_level_kept': len(survivors),
        'count_rows_sec': round(count_s, 4),
        'count_one_partition': one_part,
        'inc_commit_10_files_sec': round(inc_commit_s, 4),
        'manifests_carried_by_reference': carried,
        'full_commit_sec': round(full_commit_s, 4),
    }))


if __name__ == '__main__':
    main()
