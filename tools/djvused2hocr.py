"""djvused text layer -> hOCR, the reference's ``djvu2hocr`` direction.

The reference command (lib/cli/djvu2hocr.py there) opens a DjVu file
and shells out to djvused for each page's hidden-text s-expression;
DjVu container I/O is out of scope here (SURVEY §2.1), so this CLI
takes the djvused script itself — the output of
``djvused doc.djvu -e output-txt`` or of ``tools/hocr2djvused.py`` —
and emits the same hOCR document the reference would:

    python tools/djvused2hocr.py script.djvused \\
        [--page-size WxH] [--title T] \\
        [--word-segmentation {simple,uax29}] [-l LANG] > out.html

``--page-size`` is the REAL page size (djvused ``size``); the y-flip
must use it, not the text-layer page bbox (the upside-down golden pins
that distinction). Default: each page's own bbox width/height.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocrodjvu_spark.kernel import hocr_emit, sexpr  # noqa: E402
from ocrodjvu_spark.kernel.iso639 import normalize_language  # noqa: E402
from ocrodjvu_spark.kernel.utils import parse_page_numbers  # noqa: E402


def _size(value: str):
    w, h = value.split('x')
    return int(w), int(h)


def load_djvused_pages(stream):
    """Parse ``select N / set-txt / (sexpr) / .`` blocks."""
    pages, cur, in_sexpr = [], [], False
    for line in stream.read().split('\n'):
        if line.startswith('set-txt'):
            in_sexpr, cur = True, []
        elif line == '.' and in_sexpr:
            pages.append(sexpr.parse('\n'.join(cur)))
            in_sexpr = False
        elif in_sexpr:
            cur.append(line)
    return pages


def main(argv=None, out=None):
    out = out or sys.stdout
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('path', metavar='FILE',
                   help='djvused script to convert (- for stdin)')
    p.add_argument('-p', '--pages', default=None,
                   help="pages to convert, e.g. '1,3-5'")
    p.add_argument('--page-size', metavar='WxH', type=_size,
                   default=None,
                   help='real page size; default: the page bbox')
    p.add_argument('--word-segmentation', default='simple',
                   choices=('simple', 'uax29'))
    p.add_argument('-l', '--language', default='eng')
    p.add_argument('--title', default='DjVu hidden text layer')
    args = p.parse_args(argv)
    normalize_language(args.language)
    uax29 = (args.language if args.word_segmentation == 'uax29'
             else None)
    stream = (sys.stdin if args.path == '-'
              else open(args.path, encoding='UTF-8'))
    pages = load_djvused_pages(stream)
    wanted = parse_page_numbers(args.pages)
    triples = []
    for n, page in enumerate(pages, start=1):
        if wanted is not None and n not in wanted:
            continue
        if args.page_size is not None:
            w, h = args.page_size
        else:
            w, h = int(page[3]), int(page[4])
        triples.append((page, w, h))
    out.write(hocr_emit.sexpr_to_hocr_document(
        triples, uax29=uax29, title=args.title))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
