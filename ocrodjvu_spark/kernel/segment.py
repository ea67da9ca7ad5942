"""Word segmentation: simple space/non-space runs, and UAX #29 words.

* ``simple_word_break_iterator`` yields a boundary offset at every
  space<->non-space transition plus the final offset, matching the
  reference iterator (ocrodjvu lib/unicode_support.py:27-38; golden
  offsets in tests/test_unicode_support.py:31-35).

* ``uax29_word_break_iterator`` is a from-scratch implementation of the
  Unicode UAX #29 word-boundary rules (WB1-WB999), with Word_Break
  character properties approximated from ``unicodedata`` general
  categories plus the spec's explicit code-point lists. It reproduces
  ICU's en/en-US-POSIX word segmentation for the Latin-script corpus the
  golden tests cover (validated against the ICU offsets recorded in the
  reference's tests/test_unicode_support.py:57).

No PyICU dependency: the default segmentation is ``simple`` exactly as in
the reference CLI (lib/cli/hocr2djvused.py:43), and ``uax29`` uses this
pure-Python engine.
"""

from __future__ import annotations

import unicodedata
from typing import Iterator

# --- Word_Break property values -------------------------------------------

_OTHER = 0
_CR = 1
_LF = 2
_NEWLINE = 3
_EXTEND = 4
_ZWJ = 5
_RI = 6
_FORMAT = 7
_KATAKANA = 8
_HEBREW_LETTER = 9
_ALETTER = 10
_SINGLE_QUOTE = 11
_DOUBLE_QUOTE = 12
_MIDNUMLET = 13
_MIDLETTER = 14
_MIDNUM = 15
_NUMERIC = 16
_EXTENDNUMLET = 17
_WSEGSPACE = 18

_MIDLETTER_SET = frozenset('\u003a\u00b7\u0387\u055f\u05f4\u2027\ufe13\ufe55\uff1a')
_MIDNUM_SET = frozenset('\u002c\u003b\u037e\u0589\u060c\u060d\u066c\u07f8\u2044\ufe10\ufe14\ufe50\ufe54\uff0c\uff1b')
# NB: U+2018 LEFT SINGLE QUOTATION MARK is *not* MidNumLet in the UCD; only
# U+2019 (the apostrophe-like right quote) glues letters together.
_MIDNUMLET_SET = frozenset('\u002e\u2018\u2019\u2024\ufe52\uff07\uff0e')
_NEWLINE_SET = frozenset('\x0b\x0c\x85\u2028\u2029')
_KATAKANA_RANGES = (
    (0x3031, 0x3035), (0x309B, 0x309C), (0x30A0, 0x30FA), (0x30FC, 0x30FF),
    (0x31F0, 0x31FF), (0x32D0, 0x32FE), (0x3300, 0x3357), (0xFF66, 0xFF9D),
    (0x1B000, 0x1B000), (0x1B164, 0x1B167),
)
# scripts whose letters do NOT carry the ALetter property (UAX #29 excludes
# ideographs, Hiragana, and the dictionary-segmented SE-Asian scripts).
_NON_ALETTER_RANGES = (
    (0x3040, 0x309F),    # Hiragana
    (0x4E00, 0x9FFF),    # CJK Unified Ideographs
    (0x3400, 0x4DBF),    # CJK ext A
    (0xF900, 0xFAFF),    # CJK Compatibility Ideographs
    (0x20000, 0x2FA1F),  # CJK ext B..F + compat supplement
    (0x0E00, 0x0E7F),    # Thai
    (0x0E80, 0x0EFF),    # Lao
    (0x1000, 0x109F),    # Myanmar
    (0x1780, 0x17FF),    # Khmer
)


def _in_ranges(cp: int, ranges) -> bool:
    for lo, hi in ranges:
        if lo <= cp <= hi:
            return True
    return False


_PROP_CACHE: dict = {}


def _word_break_property(ch: str) -> int:
    """Memoized property lookup — pure function of the character, and
    real text reuses a small alphabet, so the unicodedata.category call
    happens once per distinct char per process."""
    prop = _PROP_CACHE.get(ch)
    if prop is None:
        prop = _PROP_CACHE[ch] = _compute_word_break_property(ch)
    return prop


def _compute_word_break_property(ch: str) -> int:
    cp = ord(ch)
    if ch == '\r':
        return _CR
    if ch == '\n':
        return _LF
    if ch in _NEWLINE_SET:
        return _NEWLINE
    if ch == '\u200d':  # ZWJ
        return _ZWJ
    if 0x1F1E6 <= cp <= 0x1F1FF:
        return _RI
    if ch == '"':
        return _DOUBLE_QUOTE
    if ch == "'":
        return _SINGLE_QUOTE
    if ch in _MIDNUMLET_SET:
        return _MIDNUMLET
    if ch in _MIDLETTER_SET:
        return _MIDLETTER
    if ch in _MIDNUM_SET:
        return _MIDNUM
    if ch == '\u202f':  # narrow no-break space
        return _EXTENDNUMLET
    cat = unicodedata.category(ch)
    if cat in ('Mn', 'Mc', 'Me') or ch == '\u200c':  # incl. ZWNJ
        return _EXTEND
    if cat == 'Cf' and ch != '\u200b':  # ZWSP is not Format
        return _FORMAT
    if cat == 'Zs':
        # WSegSpace excludes no-break spaces
        if ch in ('\u00a0', '\u2007', '\u202f'):  # no-break spaces
            return _OTHER
        return _WSEGSPACE
    if _in_ranges(cp, _KATAKANA_RANGES):
        return _KATAKANA
    if cat in ('Lu', 'Ll', 'Lt', 'Lm', 'Lo') or cat == 'Nl':
        if _in_ranges(cp, _NON_ALETTER_RANGES):
            return _OTHER
        if 0x0591 <= cp <= 0x05F2 and cat == 'Lo':
            return _HEBREW_LETTER
        return _ALETTER
    if cat == 'Nd':
        return _NUMERIC
    if cat == 'Pc':
        return _EXTENDNUMLET
    return _OTHER


_AHLETTER = (_ALETTER, _HEBREW_LETTER)
_MIDNUMLETQ = (_MIDNUMLET, _SINGLE_QUOTE)
_IGNORABLE = (_EXTEND, _FORMAT, _ZWJ)


# CLDR word-break tailoring (what ICU actually applies on top of UCD):
# CLDR root REMOVES the colons (COLON, SMALL COLON, FULLWIDTH COLON)
# from MidLetter, so "S:t" splits in en / en-US-POSIX — the locales the
# reference passes to ICU (lib/unicode_support.py:40-52). Swedish and
# Finnish re-add U+003A (abbreviations like "C:a" / "S:t" stay one
# word). Calling the iterator with locale=None gives the untailored
# UCD root where colon is still MidLetter.
_CLDR_COLONS = ':﹕：'
_CLDR_KEEP_COLON = frozenset(('sv', 'fi'))


def _locale_tailoring(locale):
    """Per-locale char->property override dict (or None for UCD root)."""
    if locale is None:
        return None
    base = str(locale).replace('-', '_').split('_')[0].lower()
    drop = _CLDR_COLONS[1:] if base in _CLDR_KEEP_COLON else _CLDR_COLONS
    return {ch: _OTHER for ch in drop}


# --- dictionary-based segmentation (SE-Asian scripts) ---------------------
#
# The reference delegates word breaking to ICU
# (lib/unicode_support.py:40-52), which switches to dictionary-backed
# segmentation for scripts written without inter-word spaces (Thai, Lao,
# Khmer, Myanmar, CJK). This embedded lexicon gives the Thai locale
# least-cost-path segmentation with the same *shape* as ICU's
# dictionary engines: the Viterbi pass below minimizes total path cost
# (one unit per dictionary word, a heavy per-character penalty for
# characters matching no entry, adjacent unknown characters merging
# into a single chunk), so an ambiguous compound resolves to the
# fewest-words reading rather than the greedy longest-first one —
# e.g. 'มากิน' ("come eat") segments as มา|กิน (2 words), where greedy
# longest-match would take มาก ("much") and strand the unmatchable
# tail ิน as an unknown chunk. It remains an approximation — ICU ships
# ~40k-entry frequency dictionaries; this is a compact common-word
# lexicon — so Thai segmentation is *reasonable* rather than
# byte-for-ICU. CJK locales keep the UAX #29 root behavior by DEFAULT
# (one word per ideograph, Katakana runs joined by WB13; pinned by the
# extract_uax29_cjk gate and documented in SURVEY §2); an explicit
# 'zh_dict' / 'ja_dict' locale opts Han runs into the same least-cost
# engine over the embedded CJK lexicon (extract_uax29_cjk_dict gate).

_THAI_LEXICON = frozenset((
    # pronouns / people
    'ผม', 'ฉัน', 'คุณ', 'เรา', 'เขา', 'มัน', 'คน', 'เด็ก',
    'ผู้หญิง', 'ผู้ชาย', 'ครู', 'หมอ', 'เพื่อน', 'ครอบครัว',
    'พ่อ', 'แม่', 'ลูก', 'พี่', 'น้อง',
    # common verbs
    'กิน', 'ดื่ม', 'นอน', 'เดิน', 'วิ่ง', 'พูด', 'ฟัง', 'อ่าน',
    'เขียน', 'เรียน', 'ทำงาน', 'ทำ', 'ไป', 'มา', 'อยู่', 'เป็น',
    'มี', 'ได้', 'ให้', 'รัก', 'ชอบ', 'เห็น', 'รู้', 'คิด',
    # function words
    'ไม่', 'และ', 'หรือ', 'แต่', 'กับ', 'ของ', 'ที่', 'ใน',
    'บน', 'จาก', 'ถึง', 'จะ', 'ว่า', 'แล้ว', 'ก็', 'นี้', 'นั้น',
    # nouns
    'ประเทศ', 'ไทย', 'ภาษา', 'น้ำ', 'ข้าว', 'บ้าน', 'เมือง',
    'โรงเรียน', 'หนังสือ', 'เวลา', 'วันนี้', 'วัน', 'ปี', 'เดือน',
    'อาหาร', 'ตลาด', 'รถ', 'ไฟ', 'ฟ้า', 'ทะเล', 'ภูเขา',
    'ต้นไม้', 'ดอกไม้', 'หมา', 'แมว', 'นก', 'ปลา', 'ใจ', 'งาน',
    'สวัสดี', 'ขอบคุณ', 'ครับ', 'ค่ะ',
    # adjectives / adverbs / numerals
    'ดี', 'ใหม่', 'เก่า', 'ใหญ่', 'เล็ก', 'ร้อน', 'เย็น', 'หนาว',
    'สวย', 'เร็ว', 'ช้า', 'มาก', 'น้อย',
    'หนึ่ง', 'สอง', 'สาม', 'สี่', 'ห้า',
))
_THAI_MAX_LEN = max(len(w) for w in _THAI_LEXICON)


# common 2–3-character CJK words (simplified + a few traditional /
# Japanese kanji forms) for the OPT-IN 'zh_dict' / 'ja_dict' locales —
# the default CJK path stays UAX #29 root rules
_CJK_LEXICON = frozenset((
    # pronouns / people
    '我们', '你们', '他们', '她们', '大家', '自己', '先生', '小姐',
    '朋友', '孩子', '女人', '男人', '学生', '老师', '医生', '父母',
    '人民', '人们',
    # places / institutions
    '中国', '日本', '美国', '英国', '法国', '德国', '北京', '上海',
    '国家', '世界', '城市', '农村', '地方', '学校', '大学', '中学',
    '小学', '医院', '公司', '工厂', '商店', '饭店', '银行', '机场',
    '车站', '公园', '图书馆', '办公室',
    # time
    '时间', '今天', '明天', '昨天', '现在', '以后', '以前', '上午',
    '下午', '晚上', '早上', '星期', '小时', '分钟', '时候', '今年',
    '明年', '去年',
    # common nouns
    '问题', '社会', '经济', '政府', '市场', '技术', '发展', '文化',
    '历史', '教育', '科学', '电脑', '电话', '手机', '网络', '信息',
    '新闻', '音乐', '电影', '天气', '东西', '事情', '工作', '生活',
    '汉语', '英语', '日语', '语言', '文字', '名字', '身体', '健康',
    '运动', '足球', '篮球', '照片', '颜色', '火车', '汽车', '飞机',
    '词典', '课本', '作业', '考试', '成绩', '水果', '苹果', '米饭',
    '面条', '鸡蛋', '牛奶', '面包', '咖啡', '蔬菜', '计算机',
    '互联网', '出租车', '服务员', '运动员', '科学家', '艺术家',
    # verbs / verb phrases
    '学习', '工作', '生活', '认识', '知道', '认为', '觉得', '希望',
    '喜欢', '开始', '结束', '应该', '可以', '需要', '帮助', '介绍',
    '参加', '离开', '回来', '出去', '起来', '睡觉', '吃饭', '喝水',
    '说话', '看书', '写字', '唱歌', '跳舞', '游泳', '跑步', '旅游',
    '买东西',
    # function / adverbial
    '什么', '怎么', '为什么', '这个', '那个', '这里', '那里', '因为',
    '所以', '但是', '如果', '虽然', '而且', '或者', '还是', '已经',
    '非常', '真的', '一起', '一样', '很多', '一点', '有点', '没有',
    '不是', '就是', '都是', '不过',
    # greetings
    '你好', '谢谢', '再见', '对不起', '没关系',
    # traditional / Japanese kanji forms
    '日本語', '中国語', '英語', '電話', '電車', '時間', '仕事',
    '会社', '學校', '學生', '老師', '銀行', '圖書館', '經濟',
    '問題', '國家', '歷史', '發展',
))
_CJK_MAX_LEN = max(len(w) for w in _CJK_LEXICON)


def _is_thai(ch: str) -> bool:
    return 0x0E00 <= ord(ch) <= 0x0E7F


_HAN_RANGES = (
    (0x4E00, 0x9FFF),    # CJK Unified Ideographs
    (0x3400, 0x4DBF),    # CJK ext A
    (0xF900, 0xFAFF),    # CJK Compatibility Ideographs
    (0x20000, 0x2FA1F),  # CJK ext B..F + compat supplement
)


def _is_han(ch: str) -> bool:
    return _in_ranges(ord(ch), _HAN_RANGES)


# locale key -> (script predicate, lexicon, max word length); 'th'
# engages automatically (as ICU does), the CJK entries only via the
# explicit '_dict' locale variant resolved in uax29_word_break_iterator
_DICT_LOCALES = {
    'th': (_is_thai, _THAI_LEXICON, _THAI_MAX_LEN),
    'zh@dict': (_is_han, _CJK_LEXICON, _CJK_MAX_LEN),
    'ja@dict': (_is_han, _CJK_LEXICON, _CJK_MAX_LEN),
}

# least-cost path weights: ICU's dictionary engines run a Viterbi-style
# best-path search; with an unweighted lexicon the objective reduces to
# "fewest words, unknown characters heavily penalized"
_WORD_COST = 1
_UNKNOWN_CHAR_COST = 5


def _dict_run_boundaries(run: str, words, max_len) -> list:
    """Least-cost (Viterbi) segmentation boundaries (offsets into
    ``run``, end inclusive).

    Backward DP: ``best[i]`` is the cheapest cost to segment
    ``run[i:]``; each dictionary word costs ``_WORD_COST``, each
    character matching no entry ``_UNKNOWN_CHAR_COST``. Ties prefer
    the longer dictionary word (lengths iterated descending, first
    strict improvement wins), and any dictionary word beats an
    equal-cost unknown step. Adjacent unknown characters merge into a
    single chunk when the boundaries are emitted — the ICU-shaped
    unknown-run rule the greedy predecessor also had.
    """
    n = len(run)
    best = [0] * (n + 1)
    step = [1] * (n + 1)       # chosen token length at i; 0 = unknown
    for i in range(n - 1, -1, -1):
        cost = _UNKNOWN_CHAR_COST + best[i + 1]
        take = 0
        for length in range(min(max_len, n - i), 0, -1):
            if run[i:i + length] in words:
                c = _WORD_COST + best[i + length]
                if c < cost:
                    cost, take = c, length
        best[i], step[i] = cost, take
    bounds = []
    i = 0
    while i < n:
        if step[i]:
            i += step[i]
        else:                   # merge the whole unknown run
            while i < n and not step[i]:
                i += 1
        bounds.append(i)
    return bounds


def _apply_dictionary(text: str, base_bounds, in_script, words, max_len):
    """Replace per-grapheme boundaries inside runs of the dictionary's
    script with least-cost dictionary boundaries; everything outside
    the runs keeps the UAX #29 root segmentation. The boundary AT a
    run's end is the base rules' decision, not the dictionary's: a
    non-script Extend/ZWJ character following the run must stay glued
    to the last word (WB4), and the base segmentation already encodes
    that."""
    runs = []
    i, n = 0, len(text)
    while i < n:
        if in_script(text[i]):
            j = i
            while j < n and in_script(text[j]):
                j += 1
            runs.append((i, j))
            i = j
        else:
            i += 1
    out = set(base_bounds)
    for s, e in runs:
        out -= set(range(s + 1, e))
        out.update(s + b for b in
                   _dict_run_boundaries(text[s:e], words, max_len)
                   if s + b < e)
    return sorted(out)


def uax29_word_break_iterator(text: str, locale=None) -> Iterator[int]:
    """Yield UAX #29 word-boundary offsets (excluding 0, including len).

    ``locale`` applies CLDR segmentation tailorings where they exist
    (see ``_locale_tailoring``) plus least-cost dictionary segmentation
    for locales with an embedded lexicon (``_DICT_LOCALES``: Thai
    automatically, Han runs via the explicit ``zh_dict`` / ``ja_dict``
    variant); unknown locales fall back to the root rules.
    """
    n = len(text)
    if n == 0:
        return
    if text.isascii() and text.isalnum():
        # ASCII [0-9A-Za-z]+ is all ALetter/Numeric: WB5/8/9/10 join
        # every position, so the only boundary is the end — the
        # dominant case for space-split tokens, locale-independent
        yield n
        return
    if locale is not None:
        parts = str(locale).replace('-', '_').lower().split('_')
        key = parts[0]
        if key in ('zh', 'ja') and 'dict' in parts[1:]:
            key += '@dict'
        dict_entry = _DICT_LOCALES.get(key)
        if dict_entry and any(dict_entry[0](ch) for ch in text):
            root = _uax29_root_iterator(text, locale)
            yield from _apply_dictionary(text, root, *dict_entry)
            return
    yield from _uax29_root_iterator(text, locale)


def _uax29_root_iterator(text: str, locale=None) -> Iterator[int]:
    n = len(text)
    overrides = _locale_tailoring(locale)
    if overrides:
        # explicit membership test: a future tailoring may map to the
        # falsy _OTHER (0)
        props = [overrides[ch] if ch in overrides
                 else _word_break_property(ch) for ch in text]
    else:
        props = [_word_break_property(ch) for ch in text]

    # collapsed view per WB4: positions whose property is Extend/Format/ZWJ
    # attach to the previous character
    def prev_base(i):
        # property of the last non-ignorable char strictly before i, and its index
        j = i - 1
        while j >= 0 and props[j] in _IGNORABLE:
            j -= 1
        return (props[j] if j >= 0 else None), j

    def next_base(i):
        # property of the next non-ignorable char at/after i, and its index
        j = i
        while j < n and props[j] in _IGNORABLE:
            j += 1
        return (props[j] if j < n else None), j

    for i in range(1, n):
        left_raw = props[i - 1]
        right_raw = props[i]
        # WB3: CR x LF
        if left_raw == _CR and right_raw == _LF:
            continue
        # WB3a / WB3b: break around newlines
        if left_raw in (_CR, _LF, _NEWLINE) or right_raw in (_CR, _LF, _NEWLINE):
            yield i
            continue
        # WB3d: WSegSpace x WSegSpace (keep space runs together)
        if left_raw == _WSEGSPACE and right_raw == _WSEGSPACE:
            continue
        # WB4: X (Extend|Format|ZWJ)* -> treat ignorables as glue
        if right_raw in _IGNORABLE:
            continue
        left, li = prev_base(i)
        right = right_raw
        if left is None:
            yield i
            continue
        if left in _AHLETTER and right in _AHLETTER:
            continue  # WB5
        if left in _AHLETTER and right in (_MIDLETTER,) + _MIDNUMLETQ:
            nxt, _ = next_base(i + 1)
            if nxt in _AHLETTER:
                continue  # WB6
        if left in (_MIDLETTER,) + _MIDNUMLETQ and right in _AHLETTER:
            prv, _ = prev_base(li)
            if prv in _AHLETTER:
                continue  # WB7
        if left == _HEBREW_LETTER and right == _SINGLE_QUOTE:
            continue  # WB7a
        if left == _HEBREW_LETTER and right == _DOUBLE_QUOTE:
            nxt, _ = next_base(i + 1)
            if nxt == _HEBREW_LETTER:
                continue  # WB7b
        if left == _DOUBLE_QUOTE and right == _HEBREW_LETTER:
            prv, _ = prev_base(li)
            if prv == _HEBREW_LETTER:
                continue  # WB7c
        if left == _NUMERIC and right == _NUMERIC:
            continue  # WB8
        if left in _AHLETTER and right == _NUMERIC:
            continue  # WB9
        if left == _NUMERIC and right in _AHLETTER:
            continue  # WB10
        if left in (_MIDNUM,) + _MIDNUMLETQ and right == _NUMERIC:
            prv, _ = prev_base(li)
            if prv == _NUMERIC:
                continue  # WB11
        if left == _NUMERIC and right in (_MIDNUM,) + _MIDNUMLETQ:
            nxt, _ = next_base(i + 1)
            if nxt == _NUMERIC:
                continue  # WB12
        if left == _KATAKANA and right == _KATAKANA:
            continue  # WB13
        if left in (_ALETTER, _HEBREW_LETTER, _NUMERIC, _KATAKANA, _EXTENDNUMLET) \
                and right == _EXTENDNUMLET:
            continue  # WB13a
        if left == _EXTENDNUMLET and right in (_ALETTER, _HEBREW_LETTER, _NUMERIC, _KATAKANA):
            continue  # WB13b
        if left == _RI and right == _RI:
            # WB15/16: only pair up even runs of regional indicators
            run = 0
            j = li
            while j >= 0:
                p, j2 = prev_base(j)
                if p == _RI:
                    run += 1
                    j = j2
                else:
                    break
            if run % 2 == 0:
                continue
        yield i  # WB999
    yield n


def simple_word_break_iterator(text: str) -> Iterator[int]:
    """Boundary at every space<->non-space transition, plus the end."""
    if not text:
        return
    space = text[0].isspace()
    for n, ch in enumerate(text):
        if space != ch.isspace():
            yield n
            space = not space
    yield len(text)


def word_break_iterator(text: str, locale=None) -> Iterator[int]:
    """simple segmentation when locale is None, else UAX #29.

    The UAX #29 engine applies CLDR per-locale tailorings where they
    exist (sv/fi colon-as-MidLetter); every other locale — including
    the reference's en / en-US-POSIX, which have no word-break
    tailorings in CLDR — gets the root rules, matching ICU.
    """
    if locale is None:
        return simple_word_break_iterator(text)
    return uax29_word_break_iterator(text, locale=locale)
