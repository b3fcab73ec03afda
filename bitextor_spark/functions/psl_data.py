"""Public-suffix rules for registered-domain extraction (C16).

A curated, offline subset of the Public Suffix List (publicsuffix.org —
public domain data; the reference resolves the same semantics through
tldextract, bitextor/rules/common.smk:17-36). Covers every generic TLD by
the default ``*`` rule plus the widely-used ccTLD second-level registries;
wildcard (``*.ck``) and exception (``!www.ck``) rule forms are included so
the matcher implements the full PSL algorithm, not a lookup table.

The set is intentionally data — extend by editing the tables below or
dropping in a full PSL snapshot; the matcher in urls.py is agnostic to
list size.
"""

from __future__ import annotations

# TLD -> second-level public-suffix labels under it
_SECOND_LEVEL: dict[str, str] = {
    "uk": "ac co gov ltd me mod net nhs org plc police sch",
    "au": "asn com edu gov id net org",
    "jp": "ac ad co ed go gr lg ne or",
    "kr": "ac co es go hs kg mil ms ne or pe re sc",
    "tr": "av bbs bel biz com dr edu gen gov info k12 kep name net org pol tel tsk tv web",
    "mx": "com edu gob net org",
    "br": "adv agr am arq art ato b bio blog bmd cim cng cnt com coop "
          "ecn eco edu emp eng esp etc eti far flog fm fnd fot fst g12 "
          "ggf gov imb ind inf jor jus leg lel mat med mil mp mus net "
          "nom not ntr odo org ppg pro psc psi qsl radio rec slg srv "
          "taxi teo tmp trd tur tv vet vlog wiki zlg",
    "in": "ac co edu firm gen gov ind mil net nic org res",
    "za": "ac co edu gov law mil net nom org school web",
    "nz": "ac co cri geek gen govt health iwi kiwi maori mil net org parliament school",
    "cn": "ac ah bj com cq edu fj gd gov gs gx gz ha hb he hi hk hl hn "
          "jl js jx ln mil mo net nm nx org qh sc sd sh sn sx tj tw xj xz yn zj",
    "ar": "com edu gob gov int mil net org tur",
    "my": "com edu gov mil name net org",
    "sg": "com edu gov net org per",
    "hk": "com edu gov idv net org",
    "tw": "club com ebiz edu game gov idv mil net org",
    "th": "ac co go in mi net or",
    "id": "ac biz co desa go mil my net or sch web",
    "ph": "com edu gov i mil net ngo org",
    "vn": "ac biz com edu gov health info int name net org pro",
    "il": "ac co gov idf k12 muni net org",
    "ua": "com edu gov in net org",
    "pl": "com net org edu gov info mil waw",
    "es": "com edu gob nom org",
    "pt": "com edu gov int net nome org publ",
    "co": "arts com edu firm gov info int mil net nom org rec web",
    "ke": "ac co go info me mobi ne or sc",
    "ng": "com edu gov i mil mobi name net org sch",
    "eg": "com edu eun gov mil name net org sci",
    "sa": "com edu gov med net org pub sch",
    "pk": "ac biz com edu fam gob gok gon gop gos gov net org web",
    "bd": "ac com edu gov mil net org",
    "lk": "ac com edu gov grp hotel int ltd net ngo org sch soc web",
    "np": "com edu gov mil net org",
    "ve": "arts co com e12 edu firm gob gov info int mil net org rec store tec web",
    "pe": "com edu gob mil net nom org",
    "ec": "com edu fin gob gov info k12 med mil net org pro",
    "bo": "com edu gob gov int mil net org tv",
    "py": "com coop edu gov mil net org",
    "uy": "com edu gub mil net org",
    "do": "art com edu gob gov mil net org sld web",
    "gt": "com edu gob ind mil net org",
    "cr": "ac co ed fi go or sa",
    "ni": "ac biz co com edu gob in info int mil net nom org web",
    "hn": "com edu gob mil net org",
    "sv": "com edu gob org red",
    "pa": "abo ac com edu gob ing med net nom org sld",
    "cu": "com edu gov inf net org",
    "ru": "com edu gov int mil net org",
    "by": "com gov mil of",
    "kz": "com edu gov mil net org",
    "uz": "co com net org",
    "ge": "com edu gov mil net org pvt",
    "ma": "ac co gov net org press",
    "tn": "com ens fin gov ind info intl mincom nat net org perso tourism",
    "dz": "art asso com edu gov net org pol soc tm",
    "et": "biz com edu gov info name net org",
    "tz": "ac co go hotel info me mil mobi ne or sc tv",
    "ug": "ac co com go ne or org sc",
    "zm": "ac biz co com edu gov info mil net org sch",
    "zw": "ac co gov mil org",
    "gh": "com edu gov mil org",
    "rs": "ac co edu gov in org",
    "ba": "com edu gov mil net org rs unbi unsa",
    "mk": "com edu gov inf name net org",
    "al": "com edu gov mil net org",
    "cy": "ac biz com ekloges gov ltd mil net org press pro tm",
    "mt": "com edu gov net org",
    "lv": "asn com conf edu gov id mil net org",
    "ee": "aip com edu fie gov lib med org pri riik",
    "lt": "gov",
}

# full multi-label rules that don't fit the TLD->labels table
_EXTRA_RULES = (
    "k12.tr",
    "gov.uk",  # redundant with table; harmless
    "sch.uk",
    "*.ck",
    "!www.ck",
    "*.er",
    "*.kh",
    "*.mm",
    "*.np",
    "*.bn",
)

# PSL "private domains" section entries relevant to crawl sharding: each
# subdomain is an independent site (reference keeps these per-host,
# common.smk:23-29). The platform substring carve-out in urls.py subsumes
# blogspot/wordpress; these add the exact-match platforms.
PRIVATE_SUFFIXES = frozenset(
    {"github.io", "gitlab.io", "herokuapp.com", "netlify.app", "web.app",
     "pages.dev", "vercel.app", "s3.amazonaws.com", "cloudfront.net",
     "azurewebsites.net", "appspot.com", "firebaseapp.com", "neocities.org",
     "readthedocs.io", "tumblr.com", "weebly.com", "wixsite.com"}
)


def build_rules() -> tuple[frozenset[str], frozenset[str], frozenset[str]]:
    """(exact_rules, wildcard_parents, exception_rules) label-joined."""
    exact: set[str] = set()
    wildcard: set[str] = set()
    exception: set[str] = set()
    for tld, labels in _SECOND_LEVEL.items():
        exact.add(tld)
        for lab in labels.split():
            exact.add(f"{lab}.{tld}")
    for rule in _EXTRA_RULES:
        if rule.startswith("!"):
            exception.add(rule[1:])
        elif rule.startswith("*."):
            wildcard.add(rule[2:])
        else:
            exact.add(rule)
    exact |= PRIVATE_SUFFIXES
    return frozenset(exact), frozenset(wildcard), frozenset(exception)
