"""Porter stemmer — the ORIGINAL published algorithm, implemented from the
paper: M.F. Porter, "An algorithm for suffix stripping", Program 14(3)
1980, pp. 130-137 (public algorithm; no reference code involved).

Why it exists here: the reference's RARE ROUGE-L branch scores with
``rouge_scorer.RougeScorer(["rougeL"], use_stemmer=True)``
(/root/reference/geoIR/eval/rare.py:32). rouge_score's tokenizer lowercases,
splits on non-alphanumerics, and stems every token LONGER than 3 chars.
Its stemmer is NLTK's Porter in NLTK_EXTENSIONS mode — an externally
maintained variant with an irregular-form pool and departures from the
paper. We implement the paper algorithm exactly (pinned by the paper's own
worked examples in tests/test_stemmer.py) and document the residual delta:
NLTK-extension behaviors (e.g. its special-case pool) are NOT reproduced.
``operators.evalops.rare_rouge(use_stemmer=True)`` applies this under the
same len>3 contract as rouge_score's tokenizer.

Performance contract: stemming runs inside Arrow batch kernels. The hot
entry point is :func:`stem_tokens`, which dedupes the batch vocabulary
first — per-call cost is O(distinct tokens), not O(tokens), and repeated
batches hit the module-level memo. The per-word routine is plain Python
(string scanning; fine for vocabulary-sized inputs), never per-row Spark.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    """Paper definition: a,e,i,o,u are vowels; y is a vowel iff preceded by
    a consonant (and a consonant at position 0 or after a vowel)."""
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel->consonant transitions."""
    m = 0
    prev_cons = True
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and not prev_cons:
            m += 1
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_cons(stem, len(stem) - 1)
    )


def _ends_cvc(stem: str) -> bool:
    """*o: ends consonant-vowel-consonant where the final consonant is not
    w, x or y."""
    if len(stem) < 3:
        return False
    return (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
        and stem[-1] not in "wxy"
    )


# (suffix, replacement) rule tables for steps 2-4. Within a step the
# LONGEST matching suffix is selected first and ONLY that rule's condition
# is tested (paper p.132: "the longest one is obeyed") — a failed condition
# does not fall through to shorter suffixes.
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_rule(word: str, rules):
    best = None
    for suf, rep in rules:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def step1a(word: str) -> str:
    if word.endswith("sses"):
        return word[:-2]
    if word.endswith("ies"):
        return word[:-2]
    if not word.endswith("ss") and word.endswith("s"):
        return word[:-1]
    return word


def step1b(word: str) -> str:
    fired = False
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    elif word.endswith("ed") and _has_vowel(word[:-2]):
        word = word[:-2]
        fired = True
    elif word.endswith("ing") and _has_vowel(word[:-3]):
        word = word[:-3]
        fired = True
    if fired:
        if word.endswith(("at", "bl", "iz")):
            word += "e"
        elif _ends_double_cons(word) and word[-1] not in "lsz":
            word = word[:-1]
        elif _measure(word) == 1 and _ends_cvc(word):
            word += "e"
    return word


def step1c(word: str) -> str:
    if word.endswith("y") and _has_vowel(word[:-1]):
        return word[:-1] + "i"
    return word


def _replace_step(word: str, rules) -> str:
    rule = _longest_rule(word, rules)
    if rule is not None:
        suf, rep = rule
        if _measure(word[: -len(suf)]) > 0:
            return word[: -len(suf)] + rep
    return word


def step2(word: str) -> str:
    return _replace_step(word, _STEP2)


def step3(word: str) -> str:
    return _replace_step(word, _STEP3)


def step4(word: str) -> str:
    rule = _longest_rule(word, [(s, "") for s in _STEP4])
    if rule is not None:
        suf, _ = rule
        stem = word[: -len(suf)]
        if _measure(stem) > 1 and (suf != "ion" or stem.endswith(("s", "t"))):
            return stem
    return word


def step5a(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return word


def step5b(word: str) -> str:
    if _measure(word) > 1 and _ends_double_cons(word) and word.endswith("l"):
        return word[:-1]
    return word


def porter_stem(word: str) -> str:
    """Stem one lowercase word per the original 1980 algorithm. Words of
    length <= 2 are returned unchanged (paper p.137: strings of length 1
    or 2 are left untouched). NOTE the paper's rule tables illustrate each
    STEP in isolation (e.g. its step-1b table shows agreed->agree; the full
    algorithm then takes step 5a's E-removal to agre) — tests pin the step
    functions against the tables and the full chain against the paper's
    worked multi-step derivations."""
    if len(word) <= 2:
        return word
    for step in (step1a, step1b, step1c, step2, step3, step4, step5a, step5b):
        word = step(word)
    return word


# Cross-batch memo: corpora repeat vocabulary heavily across Arrow batches;
# bounded so a pathological unique-token stream cannot grow the executor
# heap without limit.
_MEMO: dict[str, str] = {}
_MEMO_CAP = 1_000_000


def stem_tokens(tokens, min_len: int = 4) -> list[str]:
    """Stem an iterable of tokens, deduping first (O(distinct) stem calls).
    ``min_len=4`` reproduces rouge_score's tokenizer contract of stemming
    only tokens with len(x) > 3; pass 1 to stem everything."""
    toks = list(tokens)
    out: dict[str, str] = {}
    for t in toks:
        if t in out:
            continue
        if len(t) < min_len:
            out[t] = t
            continue
        hit = _MEMO.get(t)
        if hit is None:
            hit = porter_stem(t)
            if len(_MEMO) < _MEMO_CAP:
                _MEMO[t] = hit
        out[t] = hit
    return [out[t] for t in toks]
