"""hOCR -> djvused script, the reference's ``hocr2djvused`` CLI.

Mirrors the option surface of the reference command
(lib/cli/hocr2djvused.py:36-48 there) over this repo's kernel, so a
user of the reference can run the same invocation unchanged:

    python tools/hocr2djvused.py [options] [FILE...] > out.djvused

Reads hOCR markup (files or stdin), writes one
``select N / remove-txt / set-txt / <sexpr> / .`` block per page —
the same output the golden corpus pins (68 cases x {default, html5}).
For table-scale batches use ``tools/run_pipeline.py`` instead; this
command is the single-document parity face.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocrodjvu_spark.kernel import hocr, sexpr  # noqa: E402
from ocrodjvu_spark.kernel.iso639 import normalize_language  # noqa: E402


def _size(value: str):
    w, h = value.split('x')
    return int(w), int(h)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--rotation', type=int, default=0,
                   help='page rotation (in degrees)')
    p.add_argument('--page-size', metavar='WxH', type=_size, default=None,
                   help='page size (in pixels)')
    p.add_argument('-t', '--details', default='words',
                   choices=('lines', 'words', 'chars'),
                   help='amount of text details to extract')
    p.add_argument('--word-segmentation', default='simple',
                   choices=('simple', 'uax29'),
                   help='word segmentation algorithm')
    p.add_argument('-l', '--language', default='eng')
    p.add_argument('--html5', action='store_true',
                   help='use HTML5 parser')
    p.add_argument('--fix-utf8', action='store_true',
                   help='attempt to fix UTF-8 encoding issues')
    p.add_argument('input_files', metavar='FILE', nargs='*',
                   help='hOCR file to parse (default: standard input)')
    return p


def main(argv=None, out=None):
    out = out or sys.stdout
    args = build_parser().parse_args(argv)
    if args.rotation % 90:
        build_parser().error('rotation must be a multiple of 90 degrees')
    normalize_language(args.language)
    uax29 = (args.language if args.word_segmentation == 'uax29'
             else None)
    sources = args.input_files or ['-']
    i = 0
    for src in sources:
        data = (sys.stdin.buffer.read() if src == '-'
                else open(src, 'rb').read())
        pages = hocr.extract_sexprs(
            data,
            rotation=args.rotation,
            details=hocr.DETAILS_BY_NAME[args.details],
            uax29=uax29,
            html5=args.html5,
            fix_utf8=args.fix_utf8,
            page_size=args.page_size,
        )
        for page in pages:
            i += 1
            out.write(f'select {i}\nremove-txt\nset-txt\n')
            out.write(sexpr.print_pretty(page))
            out.write('\n.\n\n')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
