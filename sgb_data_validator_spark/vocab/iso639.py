"""ISO 639-1 two-letter language codes (public standard data).

Source: the Library of Congress ISO 639-2/1 registry
(https://www.loc.gov/standards/iso639-2/php/code_list.php) — the same
public list the reference validator carries
(/root/reference/src/iso639.py:9-196, 184 codes; its test asserts the
exact count, test/test_iso639.py:106).

Membership checking is case-insensitive per the reference
(iso639.py:199-223) and runs as a codegen'd InSet via
``operators.rules.in_vocabulary(..., case_insensitive=True)`` — a
184-element literal needs no join at any scale.
"""

ISO_639_1_CODES: frozenset[str] = frozenset(
    "aa ab ae af ak am an ar as av ay az ba be bg bh bi bm bn bo br bs "
    "ca ce ch co cr cs cu cv cy da de dv dz ee el en eo es et eu fa ff "
    "fi fj fo fr fy ga gd gl gn gu gv ha he hi ho hr ht hu hy hz ia id "
    "ie ig ii ik io is it iu ja jv ka kg ki kj kk kl km kn ko kr ks ku "
    "kv kw ky la lb lg li ln lo lt lu lv mg mh mi mk ml mn mr ms mt my "
    "na nb nd ne ng nl nn no nr nv ny oc oj om or os pa pi pl ps pt qu "
    "rm rn ro ru rw sa sc sd se sg si sk sl sm sn so sq sr ss st su sv "
    "sw ta te tg th ti tk tl tn to tr ts tt tw ty ug uk ur uz ve vi vo "
    "wa wo xh yi yo za zh zu".split()
)

assert len(ISO_639_1_CODES) == 184
