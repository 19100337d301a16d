"""Aliquot simplification: recombine parsed QQs into maximal aliquots.

``['NENE', 'SENE', 'NWNW']`` -> ``['E2NE', 'NWNW']``.

A 4-branching quadtree registers each QQ, trims full branches, then
greedily emits maximal consolidations, preferring halves > quarters and
North > South > East > West.  Semantics match the reference
``pytrs/parser/tract/aliquot_simplify.py:44-651``, verified by the
simplify golden tables in the reference's
``tests/test_tract_and_parse.py:453-495``.

Pure-Python; mapped per row over the ``qqs`` array column inside an
Arrow-batched pandas UDF.
"""

from .aliquot import parse_aliquot
from .patterns import aq_block_re

HALF_TO_QUARTERS = {
    'N2': ('NE', 'NW'),
    'S2': ('SE', 'SW'),
    'E2': ('NE', 'SE'),
    'W2': ('NW', 'SW'),
}

AXIS_MATES = {
    'N2': ('N2', 'S2'),
    'S2': ('N2', 'S2'),
    'E2': ('E2', 'W2'),
    'W2': ('E2', 'W2'),
}

# Pairs of halves that together make a whole (standard) section.
WHOLE_PAIRS = {('N2', 'S2'), ('E2', 'W2')}

_Q_LABELS = ('NE', 'NW', 'SE', 'SW')


def _component_rank(components, prefer_short=False):
    """Sorting value for a decomposed aliquot tuple (highest-priority
    component first).  (aliquot_simplify.py:564-603)"""
    val = len(components) if prefer_short else 0
    first_char = {'N': 0, 'S': 1, 'E': 2, 'W': 3}
    second_char = {'2': 10, 'N': 20, 'S': 30, 'E': 40, 'W': 50}
    for position, comp in enumerate(components, start=1):
        x = first_char.get(comp[0], 0) + second_char.get(comp[1], 0)
        val += x / (10 ** (position * 2))
    return val


def _aliquot_rank(aliquot):
    """Sorting value for a final aliquot string: ALL first, then
    N > S > E > W and halves > quarters.  (aliquot_simplify.py:606-651)"""
    if aliquot == 'ALL':
        return float('-inf')
    comps = [aliquot[i:i + 2] for i in range(0, len(aliquot), 2)]
    comps.reverse()
    first_char = {'N': 0, 'S': 10, 'E': 20, 'W': 30}
    second_char = {'2': 1, 'N': 2, 'S': 3, 'E': 4, 'W': 5}
    val = 0
    for position, comp in enumerate(comps, start=1):
        x = first_char.get(comp[0], 0) + second_char.get(comp[1], 0)
        val += x / (10 ** (position * 2))
    return val


def _axis_of(candidate):
    """'NS' / 'EW' / None depending on which way the tuple splits.
    (aliquot_simplify.py:480-499)"""
    for comp in candidate:
        if comp in ('N2', 'S2'):
            return 'NS'
        if comp in ('E2', 'W2'):
            return 'EW'
    return None


def _cull_options(options, latest):
    """Drop options made redundant or overlapping by the consolidation
    just executed.  (aliquot_simplify.py:502-535)"""
    keep_axis = _axis_of(latest)
    quarters = HALF_TO_QUARTERS.get(latest[0])
    covered = []
    if quarters is not None:
        covered = [(q,) + latest[1:] for q in quarters]
    drop = []
    for i, opt in enumerate(options):
        if opt in covered:
            drop.append(i)
            continue
        axis = _axis_of(opt)
        if None not in (axis, keep_axis) and axis != keep_axis:
            drop.append(i)
    for i in reversed(drop):
        options.pop(i)
    return options


class _QuadNode:
    """One node of the aliquot quadtree (one quarter of its parent)."""

    __slots__ = ('parent', 'label', 'children', 'full',
                 '_options', '_substrings')

    def __init__(self, parent=None, label=None):
        self.parent = parent
        self.label = label
        self.children = {}
        self.full = False
        self._options = set()
        self._substrings = []

    # -- registration ---------------------------------------------------

    def insert(self, qq):
        """Register one pure-quarter QQ string (no halves) into the tree.
        (aliquot_simplify.py:127-159)"""
        path = [qq[i:i + 2] for i in range(0, len(qq), 2)]
        path.reverse()
        node = self
        inserted = False
        for aliq in path:
            if node.full:
                return
            if aliq not in node.children:
                node.children[aliq] = _QuadNode(parent=node, label=aliq)
            node = node.children[aliq]
            inserted = True
        if inserted:
            node.full = True

    # -- trimming --------------------------------------------------------

    def _all_full(self, trim=False):
        """Whether this node covers its whole extent; optionally collapse.
        (aliquot_simplify.py:282-327)"""
        if not self.children or self.full:
            self.full = True
            return True
        kids = [self.children.get(lbl) for lbl in _Q_LABELS]
        if any(k is None for k in kids):
            return False
        is_full = all(k._all_full() for k in kids)
        if trim and is_full:
            self.full = True
            self.children = {}
        return is_full

    def trim(self):
        """Collapse branches made up entirely of full nodes.
        (aliquot_simplify.py:329-346)"""
        if not self.children:
            return
        full = []
        for lbl, child in self.children.items():
            if child._all_full(trim=True):
                full.append(lbl)
            else:
                child.trim()
        if self.full or (len(full) == 4 and self.parent is not None):
            self.full = True
            self.children = {}

    # -- consolidation ----------------------------------------------------

    def _calc_options(self):
        """Possible consolidations of remaining nodes, e.g. full NE+NW+SE
        offers ('N2',), ('E2',), ('NE',), ('NW',), ('SE',).
        (aliquot_simplify.py:348-396)"""
        self._options = set()
        if self.full:
            self._options = {tuple(sorted(HALF_TO_QUARTERS.keys()))}
            return self._options
        full_quarters = set()
        for lbl, child in self.children.items():
            child._calc_options()
            if child.full:
                full_quarters.add(lbl)
        options = set((q,) for q in full_quarters)
        for half, quarters in HALF_TO_QUARTERS.items():
            pair = tuple(self.children.get(q) for q in quarters)
            if any(node is None for node in pair):
                continue
            if all(node.full for node in pair):
                options.add((half,))
                continue
            a, b = pair
            for cand in a._options:
                if cand[0] not in AXIS_MATES[half]:
                    # Cannot mix N/S with E/W splits.
                    continue
                if cand in b._options:
                    options.add((half,) + cand)
        self._options = options
        return options

    def _consume(self, consol):
        """Remove the nodes covered by an executed consolidation tuple.
        (aliquot_simplify.py:457-477)"""
        if not consol or not self.children:
            self.parent.children.pop(self.label)
            return
        head = consol[0]
        quarters = HALF_TO_QUARTERS.get(head)
        if quarters is not None:
            selected = [self.children[q] for q in quarters]
        else:
            selected = [self.children[head]]
        for child in selected:
            child._consume(consol[1:])

    def consolidate(self, assume_standard=False):
        """Greedily emit maximal aliquot strings; destroys the tree.
        (aliquot_simplify.py:398-455)"""
        results = []
        self.trim()
        self._calc_options()
        queue = sorted(
            self._options,
            key=lambda x: _component_rank(x, prefer_short=True))
        label = self.label or ''
        while queue:
            current = queue.pop(0)
            results.append(f"{''.join(reversed(current))}{label}")
            self._consume(current)
            _cull_options(queue, latest=current)
        for child in self.children.values():
            child.consolidate()
            for s in child._substrings:
                results.append(f"{s}{label}")
        if assume_standard and tuple(sorted(results)) in WHOLE_PAIRS:
            results = ['ALL']
        self._substrings = results
        return sorted(results, key=_aliquot_rank)


def _split_to_quarters(qq):
    """Split any halves out of a parsed aliquot string so that only
    pure quarters remain: 'N2SENE' -> ['NESENE', 'NWSENE'].
    (aliquot_simplify.py:208-226, via a break-halves re-parse)"""
    if '2' not in qq:
        return [qq]
    # Re-scrub then re-parse with break_halves.  Import here to avoid a
    # module cycle (tract preprocessing uses patterns only).
    from .tract import scrub_aliquots
    text = scrub_aliquots(qq, clean_qq=True)
    out = []
    for mo in aq_block_re.finditer(text):
        out.extend(parse_aliquot(mo.group(), qq_depth_min=2,
                                 break_halves=True))
    return out


def simplify_aliquots(qqs, assume_standard=False):
    """Combine a list of parsed QQs into the smallest equivalent list of
    aliquot strings (aliquot_simplify.py:538-561).

    By default four full quarters render as two halves (irregular
    sections can exceed 16 QQs); ``assume_standard=True`` renders the
    full standard section as ``'ALL'``.
    """
    root = _QuadNode()
    for qq in qqs:
        for pure in _split_to_quarters(qq):
            root.insert(pure)
    root.trim()
    return root.consolidate(assume_standard=assume_standard)
