"""Fixed query set over the synthetic source-code corpus vocabulary
(sources/corpus.py: language keywords + Zipf ident_NNNN identifiers).
Mix of hot keywords, mid identifiers, rare identifiers, and a zero-hit term.
"""

CODE_QUERY_SET: list[tuple[int, str]] = [
    (1, "def return"),
    (2, "class import self"),
    (3, "select from where"),
    (4, "public static void"),
    (5, "val var object"),
    (6, "ident_0001"),
    (7, "ident_0050 def"),
    (8, "ident_0500 ident_0501"),
    (9, "ident_3000"),
    (10, "ident_4500 return"),
    (11, "lambda yield try except"),
    (12, "join group order by"),
    (13, "extends implements new"),
    (14, "zz_never_a_token"),
    (15, "the a and or not"),
    (16, "match case trait"),
    (17, "ident_0100 ident_0200 ident_0300"),
    (18, "while for if else"),
    (19, "ident_2222 class"),
    (20, "string int long final"),
]
