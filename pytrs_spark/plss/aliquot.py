"""Aliquot algebra: split, standardize, subdivide, and rebuild aliquot
components; parse an aliquot block into QQs.

Semantics match the reference ``pytrs/parser/tract/aliquot_parse.py``
(subdivision definitions at :23-29, the recursion at :300-362, the
depth controller at :40-150), verified by the golden depth tables in
the reference's ``tests/test_tract_and_parse.py:52-88``.

These are pure functions on strings/lists, designed to be mapped over
pandas Series inside Arrow-batched UDFs (no per-row Python at the
Spark layer; the batch loop lives here).
"""

from functools import lru_cache

from .patterns import aq_component_re

HALVES = ('N', 'S', 'E', 'W')
QUARTERS = ('NE', 'NW', 'SE', 'SW')

# How each half (or 'ALL') breaks into quarters; order is load-bearing
# for output ordering (aliquot_parse.py:23-29).
SUBDIVIDE = {
    'ALL': QUARTERS,
    'N': ('NE', 'NW'),
    'S': ('SE', 'SW'),
    'E': ('NE', 'SE'),
    'W': ('NW', 'SW'),
}

SAME_AXIS = {'N': ('N', 'S'), 'S': ('N', 'S'),
             'E': ('E', 'W'), 'W': ('E', 'W')}


def split_components(text: str) -> list:
    """'N½SW¼NE¼' -> ['NE', 'SW', 'N'] (rightmost/largest first)."""
    comps = [mo['comp'] for mo in aq_component_re.finditer(text)]
    comps.reverse()
    return comps


def _halves_before_quarters(comps: list) -> list:
    """One pass moving halves in front of quarters (largest-first list).

    'NE/4N/2' is better said 'N/2NE/4'; 'SE/4W/2' becomes 'E/2SW/4'
    (aliquot_parse.py:153-202).  Operates on a largest-first list by
    temporarily flipping to smallest-first, same as the reference.
    """
    comps.reverse()
    i = 0
    while i < len(comps) - 1:
        small, big = comps[i], comps[i + 1]
        if not (big in HALVES and small in QUARTERS):
            i += 1
            continue
        ns_char, ew_char = small
        if big in ('N', 'S'):
            comps[i + 1] = f"{big}{ew_char}"
            comps[i] = ns_char
        else:
            comps[i + 1] = f"{ns_char}{big}"
            comps[i] = ew_char
        i += 1
    comps.reverse()
    return comps


def _merge_cross_axis_halves(comps: list) -> list:
    """One pass merging consecutive cross-axis halves: 'N','E' -> 'NE'
    (aliquot_parse.py:205-249).  Same-axis pairs ('W','E') left alone.
    """
    out = []
    i = 0
    while i < len(comps):
        a = comps[i]
        if i + 1 == len(comps):
            out.append(a)
            break
        b = comps[i + 1]
        if (a in HALVES and b in HALVES
                and b not in SAME_AXIS.get(a, ())):
            out.append(f"{b}{a}" if a in 'EW' else f"{a}{b}")
            i += 2
        else:
            out.append(a)
            i += 1
    return out


def standardize_components(comps: list) -> list:
    """Fixed point of the two single-pass rewrites above
    (aliquot_parse.py:252-268)."""
    prev = None
    while comps != prev:
        prev = comps.copy()
        comps = _halves_before_quarters(comps)
        comps = _merge_cross_axis_halves(comps)
    return comps


def rebuild(nested: list) -> list:
    """[['SE'], ['NW','SW'], ['E2']] -> ['E2NWSE', 'E2SWSE']
    (suffix product, deepest-out; aliquot_parse.py:271-297)."""
    result = []
    while nested:
        deepest = nested.pop()
        if not nested:
            result = deepest
            break
        shallower = nested.pop()
        combined = []
        for outer in shallower:
            combined.extend(f"{inner}{outer}" for inner in deepest)
        nested.append(combined)
    return result


def subdivide(component: str, depth: int) -> list:
    """Subdivide one component ``depth`` times (aliquot_parse.py:300-362).

    depth <= 0 leaves it whole (halves pick up the '2' designator).
    """
    if depth <= 0:
        if component in HALVES:
            return [component + '2']
        return [component]
    levels = [[component]]
    for _ in range(depth):
        if levels[-1][0] in SUBDIVIDE:
            head = levels.pop()[0]
            levels.append(list(SUBDIVIDE[head]))
        else:
            levels.append(list(QUARTERS))
    return rebuild(levels)


def parse_aliquot(text, qq_depth_min=2, qq_depth_max=None, qq_depth=None,
                  break_halves=False) -> list:
    """Parse one preprocessed aliquot block into QQs
    (aliquot_parse.py:40-150).

    'N½SW¼NE¼' -> ['N2SWNE'];  'N½SW¼' -> ['NESW', 'NWSW'].

    Memoized (pure function of (text, depth config); aliquot blocks
    repeat across tracts); the list is copied out.
    """
    return list(_parse_aliquot_cached(
        text, qq_depth_min, qq_depth_max, qq_depth, break_halves))


@lru_cache(maxsize=32768)
def _parse_aliquot_cached(text, qq_depth_min, qq_depth_max, qq_depth,
                          break_halves):
    if qq_depth is not None:
        qq_depth_min = qq_depth_max = qq_depth

    comps = split_components(text)
    if not comps:
        return comps
    comps = standardize_components(comps)

    if qq_depth_max is not None and len(comps) > qq_depth_max:
        comps = comps[:qq_depth_max]

    levels = []
    n = len(comps)
    for i, comp in enumerate(comps, start=1):
        depth = 0
        if i == qq_depth_min:
            depth = 1
        elif i == n and n < qq_depth_min:
            depth = qq_depth_min - i + 1
        elif comp in HALVES and (i < qq_depth_min or break_halves):
            depth = 1
        if comp in QUARTERS:
            # A quarter is already one level deeper than a half.
            depth -= 1
        levels.append(subdivide(comp, depth))
    return rebuild(levels)
