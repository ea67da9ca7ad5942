"""Shared access to the reference golden corpus (read-only fixtures).

The reference's own test corpus at /root/reference/tests/ is the oracle:
20 hOCR fixture files with 68 ``.testN`` golden djvused outputs
(tests/hocr2djvused/test.py:75-131 in the reference describes the
harness semantics we mirror: first line = CLI args, rest = expected
djvused script, compared after s-expression normalization).
"""

from __future__ import annotations

import glob
import os
import shlex

from ocrodjvu_spark.kernel import hocr

HOCR2DJVUSED_DIR = '/root/reference/tests/hocr2djvused'
DJVU2HOCR_DIR = '/root/reference/tests/djvu2hocr'


def parse_cli_args(arg_line: str) -> dict:
    """Translate a golden file's ``# --details=...`` header to kwargs."""
    args = shlex.split(arg_line)
    assert args and args[0] == '#', arg_line
    kw = dict(details=hocr.DETAILS_BY_NAME['words'], uax29=None,
              page_size=None)
    for a in args[1:]:
        if a.startswith('--details='):
            kw['details'] = hocr.DETAILS_BY_NAME[a.split('=', 1)[1]]
        elif a.startswith('--word-segmentation='):
            kw['uax29'] = True if a.split('=', 1)[1] == 'uax29' else None
        elif a.startswith('--page-size='):
            w, h = a.split('=', 1)[1].split('x')
            kw['page_size'] = (int(w), int(h))
        elif a.startswith('--rotation='):
            kw['rotation'] = int(a.split('=', 1)[1])
        elif a == '--html5':
            kw['html5'] = True
        else:
            raise ValueError(f'unknown golden arg: {a}')
    return kw


def golden_page_sexprs(expected_script: str) -> list:
    """Split a djvused script into its per-page sexpr text blocks."""
    pages, cur, in_sexpr = [], [], False
    for line in expected_script.split('\n'):
        if line.startswith('set-txt'):
            in_sexpr, cur = True, []
        elif line == '.' and in_sexpr:
            pages.append('\n'.join(cur))
            in_sexpr = False
        elif in_sexpr:
            cur.append(line)
    return pages


def golden_cases():
    """Yield (case_id, html_bytes, kwargs, [expected_sexpr_text...])."""
    for test_file in sorted(
            glob.glob(os.path.join(HOCR2DJVUSED_DIR, '*.test[0-9]'))):
        base = test_file[:-6]
        with open(test_file, 'rb') as f:
            raw = f.read().decode('UTF-8')
        arg_line, _, expected = raw.partition('\n')
        with open(base + '.html', 'rb') as f:
            html_bytes = f.read()
        yield (
            os.path.basename(test_file),
            html_bytes,
            parse_cli_args(arg_line),
            golden_page_sexprs(expected),
        )


def rough_cases():
    """Yield (case_id, html_bytes, kwargs) for fixtures without goldens."""
    known = {
        os.path.basename(t)[:-6]
        for t in glob.glob(os.path.join(HOCR2DJVUSED_DIR, '*.test[0-9]'))
    }
    configs = [dict(details=hocr.DETAILS_BY_NAME['lines'])] + [
        dict(details=hocr.DETAILS_BY_NAME[d], uax29=(True if u else None))
        for d in ('words', 'chars') for u in (0, 1)
    ]
    for html_file in sorted(glob.glob(os.path.join(HOCR2DJVUSED_DIR, '*.html'))):
        base = os.path.basename(html_file)[:-5]
        if base in known:
            continue
        with open(html_file, 'rb') as f:
            html_bytes = f.read()
        for i, cfg in enumerate(configs):
            kw = dict(cfg)
            if base.endswith(('cuneiform0.7', 'cuneiform0.8')):
                kw['page_size'] = (1000, 1000)
            yield (f'{base}-cfg{i}', html_bytes, kw)
