"""Tract-level parsing: canonicalize aliquot text, extract lots (with
acreages and leading aliquot divisions) and QQs, and raise warning
flags.

Semantics match the reference ``pytrs/parser/tract/tract_preprocess.py``
and ``tract_parse.py`` plus the lot unpacking in
``pytrs/parser/unpack/unpackers.py:22-137``, verified by the golden
tables in the reference's ``tests/test_tract_and_parse.py`` and
``tests/test_tract_preprocess.py``.

Pure-Python kernels; the Spark layer maps :func:`parse_tract` over an
Arrow batch of description strings.
"""

import re
from functools import lru_cache

from . import patterns as P
from .aliquot import parse_aliquot

NE_F, NW_F, SE_F, SW_F = 'NE¼', 'NW¼', 'SE¼', 'SW¼'
N2_F, S2_F, E2_F, W2_F = 'N½', 'S½', 'E½', 'W½'

# Scrubber regex -> canonical replacement (tract_preprocess.py:18-51).
_SCRUBBERS = (
    (P.ne_scrub, NE_F),
    (P.nw_scrub, NW_F),
    (P.se_scrub, SE_F),
    (P.sw_scrub, SW_F),
    (P.n2_scrub, N2_F),
    (P.s2_scrub, S2_F),
    (P.e2_scrub, E2_F),
    (P.w2_scrub, W2_F),
)

_LOOSE_SCRUBBERS = (
    (P.ne_loose, NE_F),
    (P.nw_loose, NW_F),
    (P.se_loose, SE_F),
    (P.sw_loose, SW_F),
)

_QUARTER_FRACS = {'ne_hit': NE_F, 'nw_hit': NW_F,
                  'se_hit': SE_F, 'sw_hit': SW_F}


def _sub_to_fixed_point(text, rgx, replacement):
    """Re-substitute until the text stops changing
    (tract_preprocess.py:76-87)."""
    prev = None
    while text != prev:
        prev = text
        text = rgx.sub(replacement, text)
    return prev


def _finish_half_plus_quarter(mo):
    """Replace e.g. 'E½NE' with 'E½NE¼' -- find which quarter matched
    rightmost and give it its fraction (tract_preprocess.py:104-134)."""
    rightmost = mo['q_rightmost']
    quarter = ''
    for group_name, frac in _QUARTER_FRACS.items():
        if mo[group_name] == rightmost:
            quarter = frac
            break
    whole = mo.group(0)
    return whole[:-len(rightmost)] + quarter


def scrub_aliquots(text, clean_qq=False):
    """Canonicalize aliquot text: 'NE/4' / 'Northeast Quarter' -> 'NE¼',
    'N/2' -> 'N½', etc.; then 'E½NE' -> 'E½NE¼'; then remove intervening
    'of the' (tract_preprocess.py:137-161)."""
    for rgx, replacement in _SCRUBBERS:
        text = _sub_to_fixed_point(text, rgx, replacement)
    if clean_qq:
        for rgx, replacement in _LOOSE_SCRUBBERS:
            text = _sub_to_fixed_point(text, rgx, replacement)
    prev = None
    while text != prev:
        prev = text
        text = P.half_plus_q_re.sub(_finish_half_plus_quarter, text)
    text = remove_aliquot_interveners(text)
    return text


def remove_aliquot_interveners(text):
    """'N½ of NE¼ of the SW¼' -> 'N½NE¼SW¼'
    (tract_preprocess.py:164-182)."""
    prev = None
    while text != prev:
        prev = text
        text = P.intervener_strip_re.sub(
            r"\g<aliquot1>\g<aliquot2>", text)
    return text


def remove_fractions(aliquot):
    """'N½NE¼' -> 'N2NE' (tract_parse.py:249-260)."""
    return aliquot.replace('¼', '').replace('½', '2')


# ---------------------------------------------------------------------
# Elided-list unpacking shared by lots and sections
# (unpackers.py:140-427)
# ---------------------------------------------------------------------

def _is_multi(mo, kind):
    if 'intervener' not in mo.groupdict():
        return False
    if mo[f'{kind}num_rightmost'] is not None:
        return True
    if mo[f'{kind}num'] is not None:
        return False
    raise ValueError


def _rightmost_num(mo, kind):
    if f'{kind}num_rightmost' not in mo.groupdict():
        return mo[f'{kind}num']
    if _is_multi(mo, kind):
        return mo[f'{kind}num_rightmost']
    return mo[f'{kind}num']


def _thru_rightmost(mo):
    if 'intervener' not in mo.groupdict():
        return False
    txt = mo['intervener']
    if txt is None:
        return False
    return P.through_re.search(txt.strip()) is not None


def _start_of_rightmost(mo):
    if 'intervener' not in mo.groupdict():
        return mo.start()
    if mo['intervener'] is not None:
        return mo.start('intervener')
    return mo.start()


def unpack_lots(txt):
    """Unpack a lot text block into (lots, lot_acres, flags, flag_lines,
    aliquots_through).

    ``aliquots_through`` is how many lots (from the left) receive a
    leading aliquot division, resetting at the second occurrence of the
    word 'Lot(s)' (unpackers.py:22-137).
    """
    lots_reversed = []
    acres = {}
    flags = []
    flag_lines = []
    word_lot_at = 0
    found_through = False
    endpos = len(txt)
    while True:
        mo = P.multilot_re.search(txt, endpos=endpos)
        if mo is None:
            break
        lot_num = int(_rightmost_num(mo, 'lot'))
        acreage = _rightmost_acreage(mo)
        endpos = 0
        if _is_multi(mo, 'lot'):
            endpos = _start_of_rightmost(mo)
        if found_through:
            # Elided list, e.g. 'Lots 3 - 9' (scanning right-to-left, so
            # the previous lot is the upper end).
            prev_lot = lots_reversed[-1]
            lo, hi = lot_num, prev_lot
            end, start, step = hi - 1, lo - 1, -1
            if lo >= hi:
                end, start, step = hi + 1, lo + 1, 1
                flag = 'nonsequential_lots'
                flags.append(flag)
                flag_lines.append((flag, f"{flag}<{lo} - {hi}>"))
            for filler in range(end, start, step):
                lots_reversed.append(filler)
        else:
            lots_reversed.append(lot_num)
        if acreage is not None:
            name = f'L{lot_num}'
            if name in acres:
                flag = f"dup_lot_acreage<{name}({acres[name]})>"
                flags.append(flag)
                flag_lines.append((flag, flag))
            acres[name] = acreage
        found_through = _thru_rightmost(mo)
        if mo['word_lot_rightmost'] is not None and not found_through:
            word_lot_at = len(lots_reversed)

    lots_reversed.reverse()
    lots = [f'L{n}' for n in lots_reversed]
    aliquots_through = len(lots) - word_lot_at
    return lots, acres, flags, flag_lines, aliquots_through


def _rightmost_acreage(mo):
    """Acreage attached to the rightmost lot, or None
    (unpackers.py:163-187)."""
    i = _start_of_rightmost(mo)
    j = mo.end(0)
    acre_mo = P.lot_acres_re.search(mo.string, pos=i, endpos=j)
    if acre_mo is None:
        return None
    return re.sub(r'[\[\]\(\)]', '', acre_mo['acreage'])


def unpack_secs(txt):
    """Unpack a section text block into (sec_list, flags, flag_lines);
    sections are zero-padded 2-char strings (unpackers.py:218-298).
    Memoized (pure; section blocks repeat heavily); lists copied out."""
    secs, flags, flag_lines = _unpack_secs_cached(txt)
    return list(secs), list(flags), list(flag_lines)


@lru_cache(maxsize=65536)
def _unpack_secs_cached(txt):
    secs_reversed = []
    flags = []
    flag_lines = []
    found_through = False
    endpos = len(txt)
    while True:
        mo = P.multisec_re.search(txt, endpos=endpos)
        if mo is None:
            break
        sec_num = str(int(_rightmost_num(mo, 'sec')))
        endpos = 0
        if _is_multi(mo, 'sec'):
            endpos = _start_of_rightmost(mo)
        new_sec = sec_num.rjust(2, '0')
        if found_through:
            prev_sec = secs_reversed[-1]
            lo, hi = int(sec_num), int(prev_sec)
            end, start, step = hi - 1, lo - 1, -1
            if lo >= hi:
                end, start, step = hi + 1, lo + 1, 1
                flag = 'nonsequential_sections'
                flags.append(flag)
                flag_lines.append((flag, f"{flag}<{lo} - {hi}>"))
            for filler in range(end, start, step):
                secs_reversed.append(str(filler).rjust(2, '0'))
        else:
            secs_reversed.append(new_sec)
        found_through = _thru_rightmost(mo)
    secs_reversed.reverse()
    return secs_reversed, flags, flag_lines


# ---------------------------------------------------------------------
# Tract parse (tract_parse.py:51-247)
# ---------------------------------------------------------------------

def _find_duplicates(lst):
    """Elements that appear again later in the list, in first-seen order
    (tract_parse.py:226-234)."""
    dups = []
    last = len(lst)
    for i, elem in enumerate(lst, start=1):
        if i == last:
            break
        if elem in lst[i:]:
            dups.append(elem)
    return dups


def parse_tract(text, clean_qq=False, suppress_lot_divs=False,
                qq_depth_min=2, qq_depth_max=None, qq_depth=None,
                break_halves=False):
    """Parse one tract description block into lots + QQs.

    Returns a dict with keys: ``lots``, ``qqs``, ``lot_acres``,
    ``aliquots_whole``, ``w_flags``, ``w_flag_lines``, ``pp_desc``.

    Memoized: tract descriptions repeat enormously in real corpora
    ('NE/4', 'S/2', ...), and the parse is a pure function of
    (text, config), so identical inputs are parsed once per worker.
    Mutable members are copied out so callers can't corrupt the cache.
    """
    r = _parse_tract_cached(text, clean_qq, suppress_lot_divs,
                            qq_depth_min, qq_depth_max, qq_depth,
                            break_halves)
    return {
        'lots': list(r['lots']),
        'qqs': list(r['qqs']),
        'lot_acres': dict(r['lot_acres']),
        'aliquots_whole': list(r['aliquots_whole']),
        'w_flags': list(r['w_flags']),
        'w_flag_lines': list(r['w_flag_lines']),
        'pp_desc': r['pp_desc'],
    }


@lru_cache(maxsize=65536)
def _parse_tract_cached(text, clean_qq, suppress_lot_divs,
                        qq_depth_min, qq_depth_max, qq_depth,
                        break_halves):
    pp_text = scrub_aliquots(text, clean_qq)
    w_flags = []
    w_flag_lines = []
    lots = []
    lot_acres = {}
    qqs = []
    aliquots_whole = []

    # Pull out lot blocks (with optional leading aliquot), splicing ';;'
    # so neighbours cannot merge (tract_parse.py:126-147).
    lot_blocks = []
    remaining = pp_text
    while True:
        mo = P.multilot_with_aliquot_re.search(remaining)
        if mo is None:
            break
        lot_blocks.append((mo['lots'], mo['aliquot']))
        remaining = f"{remaining[:mo.start()]};;{remaining[mo.end():]}"

    for block, leading_aliquot in lot_blocks:
        new_lots, new_acres, flags, flag_lines, aliquots_through = \
            unpack_lots(block)
        w_flags.extend(flags)
        w_flag_lines.extend(flag_lines)
        if not suppress_lot_divs and leading_aliquot is not None:
            prefix = remove_fractions(leading_aliquot)
            for idx in range(aliquots_through):
                new_lots[idx] = f"{prefix} of {new_lots[idx]}"
        lots.extend(new_lots)
        for lot_name, acreage in new_acres.items():
            if lot_name in lot_acres:
                flag = f"dup_lot_acreage<{lot_name}({lot_acres[lot_name]})>"
                w_flags.append(flag)
                w_flag_lines.append((flag, flag))
            lot_acres[lot_name] = acreage

    # Pull out aliquot blocks the same way (tract_parse.py:172-188).
    aliquot_blocks = []
    while True:
        mo = P.aq_block_re.search(remaining)
        if mo is None:
            break
        aliquot_blocks.append(mo.group())
        remaining = f"{remaining[:mo.start()]};;{remaining[mo.end():]}"
        aliquots_whole.append(remove_fractions(mo.group()))

    # Standalone 'ALL' with no meaningful trailing context
    # (tract_parse.py:193-199).
    squeezed = re.sub(r'\s+', ' ', remaining).strip()
    all_mo = P.all_re.search(squeezed)
    if all_mo is not None and all_mo['context'] is None:
        aliquot_blocks.append('ALL')

    if qq_depth is not None:
        qq_depth_min = qq_depth_max = qq_depth
    for block in aliquot_blocks:
        qqs.extend(parse_aliquot(
            block, qq_depth_min, qq_depth_max, qq_depth, break_halves))

    dup_lots = _find_duplicates(lots)
    dup_qqs = _find_duplicates(qqs)
    if dup_lots:
        flag = f"dup_lot<{','.join(dup_lots)}>"
        w_flags.append(flag)
        w_flag_lines.append((flag, flag))
    if dup_qqs:
        flag = f"dup_qq<{','.join(dup_qqs)}>"
        w_flags.append(flag)
        w_flag_lines.append((flag, flag))

    return {
        'lots': lots,
        'qqs': qqs,
        'lot_acres': lot_acres,
        'aliquots_whole': aliquots_whole,
        'w_flags': w_flags,
        'w_flag_lines': w_flag_lines,
        'pp_desc': pp_text,
    }
