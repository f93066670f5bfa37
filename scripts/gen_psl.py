#!/usr/bin/env python3
"""Generate src/main/resources/graft/public_suffix_list.txt.

A curated, deterministic subset of the Public Suffix List (publicsuffix.org)
re-typed from public knowledge of its contents: the high-traffic ICANN
second-level registry suffixes (country-code second-levels, US state
hierarchies, JP prefectures, CN provinces, AU state education/government),
plus the major PRIVATE-section shared-hosting suffixes (github.io,
blogspot.*, *.amazonaws.com service endpoints, ...) whose absence is what
makes a naive registered-domain rollup lump every GitHub-Pages /
Blogspot site into one cap group.

Deliberately excluded (documented in Urls.registeredDomain's scaladoc):
wildcard rules (*.ck) and exception rules (!www.ck) — the curated set
uses only exact suffix entries, and callers with the full upstream PSL
can pass additional entries via `extraSuffixes`.

Output format: one suffix per line, '#' comments, sorted, deduplicated.
Rerun: python3 scripts/gen_psl.py
"""
import os

# ---------------------------------------------------------------------------
# ICANN section: ccTLD -> second-level labels open for registration
# ---------------------------------------------------------------------------
CC_SECOND_LEVELS = {
    "ac": ["com", "edu", "gov", "net", "mil", "org"],
    "ae": ["co", "net", "org", "sch", "ac", "gov", "mil"],
    "af": ["gov", "com", "org", "net", "edu"],
    "ag": ["com", "org", "net", "co", "nom"],
    "ai": ["off", "com", "net", "org"],
    "al": ["com", "edu", "gov", "mil", "net", "org"],
    "ao": ["ed", "gv", "og", "co", "pb", "it"],
    "ar": ["com", "edu", "gob", "gov", "int", "mil", "net", "org", "tur", "musica"],
    "at": ["ac", "co", "gv", "or", "priv"],
    "au": ["com", "net", "org", "edu", "gov", "asn", "id", "info", "conf",
           "act", "nsw", "nt", "qld", "sa", "tas", "vic", "wa"],
    "aw": ["com"],
    "az": ["com", "net", "int", "gov", "org", "edu", "info", "pp", "mil", "name", "pro", "biz"],
    "ba": ["com", "edu", "gov", "mil", "net", "org", "rs"],
    "bb": ["biz", "co", "com", "corp", "edu", "gov", "info", "net", "org", "store", "tv"],
    "bd": ["com", "edu", "gov", "net", "org", "mil", "ac", "info"],
    "be": ["ac"],
    "bf": ["gov"],
    "bh": ["com", "edu", "net", "org", "gov"],
    "bi": ["co", "com", "edu", "or", "org"],
    "bj": ["asso", "gouv", "barreau"],
    "bm": ["com", "edu", "gov", "net", "org"],
    "bn": ["com", "edu", "gov", "net", "org"],
    "bo": ["com", "edu", "gob", "int", "org", "net", "mil", "tv", "web", "info"],
    "br": ["com", "net", "org", "gov", "edu", "mil", "adv", "agr", "am", "arq",
           "art", "ato", "b", "bio", "blog", "bmd", "cim", "cng", "cnt",
           "coop", "ecn", "eco", "emp", "eng", "esp", "etc", "eti", "far",
           "flog", "fm", "fnd", "fot", "fst", "g12", "ggf", "imb", "ind",
           "inf", "jor", "jus", "leg", "lel", "mat", "med", "mp", "mus",
           "nom", "not", "ntr", "odo", "ppg", "pro", "psc", "psi", "qsl",
           "radio", "rec", "slg", "srv", "taxi", "teo", "tmp", "trd", "tur",
           "tv", "vet", "vlog", "wiki", "zlg"],
    "bs": ["com", "network", "org", "edu", "gov"],
    "bt": ["com", "edu", "gov", "net", "org"],
    "bw": ["co", "org"],
    "by": ["gov", "mil", "com", "of"],
    "bz": ["com", "net", "org", "edu", "gov"],
    "ca": ["ab", "bc", "mb", "nb", "nf", "nl", "ns", "nt", "nu", "on",
           "pe", "qc", "sk", "yk", "gc"],
    "ci": ["org", "or", "com", "co", "edu", "ed", "ac", "net", "go", "asso",
           "int", "presse", "md", "gouv"],
    "cl": ["co", "gob", "gov", "mil"],
    "cm": ["co", "com", "gov", "net"],
    "cn": ["ac", "com", "edu", "gov", "net", "org", "mil",
           "ah", "bj", "cq", "fj", "gd", "gs", "gz", "gx", "ha", "hb",
           "he", "hi", "hl", "hn", "jl", "js", "jx", "ln", "nm", "nx",
           "qh", "sc", "sd", "sh", "sn", "sx", "tj", "xj", "xz", "yn", "zj",
           "hk", "mo", "tw"],
    "co": ["arts", "com", "edu", "firm", "gov", "info", "int", "mil",
           "net", "nom", "org", "rec", "web"],
    "cr": ["ac", "co", "ed", "fi", "go", "or", "sa"],
    "cu": ["com", "edu", "org", "net", "gov", "inf"],
    "cw": ["com", "edu", "net", "org"],
    "cy": ["ac", "biz", "com", "ekloges", "gov", "ltd", "mil", "net",
           "org", "press", "pro", "tm"],
    "do": ["art", "com", "edu", "gob", "gov", "mil", "net", "org", "sld", "web"],
    "dz": ["art", "asso", "com", "edu", "gov", "org", "net", "pol", "soc", "tm"],
    "ec": ["com", "info", "net", "fin", "k12", "med", "pro", "org", "edu",
           "gov", "gob", "mil"],
    "ee": ["edu", "gov", "riik", "lib", "med", "com", "pri", "aip", "org", "fie"],
    "eg": ["com", "edu", "eun", "gov", "mil", "name", "net", "org", "sci"],
    "es": ["com", "nom", "org", "gob", "edu"],
    "et": ["com", "gov", "org", "edu", "biz", "name", "info", "net"],
    "fi": ["aland"],
    "fj": ["ac", "biz", "com", "gov", "info", "mil", "name", "net", "org", "pro"],
    "fr": ["asso", "com", "gouv", "nom", "prd", "tm", "avoues", "cci",
           "greta", "huissier-justice"],
    "ge": ["com", "edu", "gov", "org", "mil", "net", "pvt"],
    "gg": ["co", "net", "org"],
    "gh": ["com", "edu", "gov", "org", "mil"],
    "gi": ["com", "ltd", "gov", "mod", "edu", "org"],
    "gl": ["co", "com", "edu", "net", "org"],
    "gn": ["ac", "com", "edu", "gov", "org", "net"],
    "gp": ["com", "net", "mobi", "edu", "org", "asso"],
    "gr": ["com", "edu", "net", "org", "gov"],
    "gt": ["com", "edu", "gob", "ind", "mil", "net", "org"],
    "gu": ["com", "edu", "gov", "guam", "info", "net", "org", "web"],
    "gy": ["co", "com", "edu", "gov", "net", "org"],
    "hk": ["com", "edu", "gov", "idv", "net", "org"],
    "hn": ["com", "edu", "org", "net", "mil", "gob"],
    "hr": ["iz", "from", "name", "com"],
    "ht": ["com", "shop", "firm", "info", "adult", "net", "pro", "org",
           "med", "art", "coop", "pol", "asso", "edu", "rel", "gouv", "perso"],
    "hu": ["co", "info", "org", "priv", "sport", "tm", "2000", "agrar",
           "bolt", "casino", "city", "erotica", "erotika", "film", "forum",
           "games", "hotel", "ingatlan", "jogasz", "konyvelo", "lakas",
           "media", "news", "reklam", "sex", "shop", "suli", "szex",
           "tozsde", "utazas", "video"],
    "id": ["ac", "biz", "co", "desa", "go", "mil", "my", "net", "or",
           "ponpes", "sch", "web"],
    "ie": ["gov"],
    "il": ["ac", "co", "gov", "idf", "k12", "muni", "net", "org"],
    "im": ["ac", "co", "com", "net", "org", "tt", "tv"],
    "in": ["co", "com", "firm", "net", "org", "gen", "ind", "nic", "ac",
           "edu", "res", "gov", "mil"],
    "iq": ["gov", "edu", "mil", "com", "org", "net"],
    "ir": ["ac", "co", "gov", "id", "net", "org", "sch"],
    "is": ["net", "com", "edu", "gov", "org", "int"],
    "it": ["gov", "edu"],
    "je": ["co", "net", "org"],
    "jm": ["com", "net", "org", "edu", "gov", "mil"],
    "jo": ["com", "org", "net", "edu", "sch", "gov", "mil", "name"],
    "jp": ["ac", "ad", "co", "ed", "go", "gr", "lg", "ne", "or",
           # the 47 prefecture geographic second-levels
           "aichi", "akita", "aomori", "chiba", "ehime", "fukui", "fukuoka",
           "fukushima", "gifu", "gunma", "hiroshima", "hokkaido", "hyogo",
           "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima", "kanagawa",
           "kochi", "kumamoto", "kyoto", "mie", "miyagi", "miyazaki",
           "nagano", "nagasaki", "nara", "niigata", "oita", "okayama",
           "okinawa", "osaka", "saga", "saitama", "shiga", "shimane",
           "shizuoka", "tochigi", "tokushima", "tokyo", "tottori", "toyama",
           "wakayama", "yamagata", "yamaguchi", "yamanashi"],
    "ke": ["ac", "co", "go", "info", "me", "mobi", "ne", "or", "sc"],
    "kg": ["org", "net", "com", "edu", "gov", "mil"],
    "kh": ["per", "com", "edu", "gov", "mil", "net", "org"],
    "ki": ["edu", "biz", "net", "org", "gov", "info", "com"],
    "kn": ["net", "org", "edu", "gov"],
    "kp": ["com", "edu", "gov", "org", "rep", "tra"],
    "kr": ["ac", "co", "es", "go", "hs", "kg", "mil", "ms", "ne", "or",
           "pe", "re", "sc",
           "seoul", "busan", "daegu", "incheon", "gwangju", "daejeon",
           "ulsan", "gyeonggi", "gangwon", "chungbuk", "chungnam",
           "jeonbuk", "jeonnam", "gyeongbuk", "gyeongnam", "jeju"],
    "kw": ["com", "edu", "emb", "gov", "ind", "net", "org"],
    "ky": ["com", "edu", "net", "org"],
    "kz": ["org", "edu", "net", "gov", "mil", "com"],
    "la": ["int", "net", "info", "edu", "gov", "per", "com", "org"],
    "lb": ["com", "edu", "gov", "net", "org"],
    "lc": ["com", "net", "co", "org", "edu", "gov"],
    "lk": ["gov", "sch", "net", "int", "com", "org", "edu", "ngo", "soc",
           "web", "ltd", "assn", "grp", "hotel", "ac"],
    "lr": ["com", "edu", "gov", "org", "net"],
    "ls": ["ac", "biz", "co", "edu", "gov", "info", "net", "org", "sc"],
    "lt": ["gov"],
    "lv": ["com", "edu", "gov", "org", "mil", "id", "net", "asn", "conf"],
    "ly": ["com", "net", "gov", "plc", "edu", "sch", "med", "org", "id"],
    "ma": ["ac", "co", "gov", "net", "org", "press"],
    "mg": ["org", "nom", "gov", "prd", "tm", "edu", "mil", "com", "co"],
    "mk": ["com", "org", "net", "edu", "gov", "inf", "name"],
    "ml": ["com", "edu", "gouv", "gov", "net", "org", "presse"],
    "mn": ["gov", "edu", "org"],
    "mo": ["com", "net", "org", "edu", "gov"],
    "mt": ["com", "edu", "net", "org"],
    "mu": ["com", "net", "org", "gov", "ac", "co", "or"],
    "mv": ["aero", "biz", "com", "coop", "edu", "gov", "info", "int",
           "mil", "museum", "name", "net", "org", "pro"],
    "mw": ["ac", "biz", "co", "com", "coop", "edu", "gov", "int", "net", "org"],
    "mx": ["com", "org", "gob", "edu", "net"],
    "my": ["biz", "com", "edu", "gov", "mil", "name", "net", "org"],
    "mz": ["ac", "adv", "co", "edu", "gov", "mil", "net", "org"],
    "na": ["info", "pro", "name", "school", "or", "dr", "us", "mx", "ca",
           "in", "cc", "tv", "ws", "mobi", "co", "com", "org"],
    "nf": ["com", "net", "per", "rec", "web", "arts", "firm", "info",
           "other", "store"],
    "ng": ["com", "edu", "gov", "i", "mil", "mobi", "name", "net", "org", "sch"],
    "ni": ["ac", "biz", "co", "com", "edu", "gob", "in", "info", "int",
           "mil", "net", "nom", "org", "web"],
    "no": ["mil", "stat", "dep", "herad", "kommune", "fhs", "vgs", "fylkesbibl",
           "folkebibl", "idrett", "priv"],
    "np": ["com", "edu", "gov", "mil", "net", "org"],
    "nr": ["biz", "info", "gov", "edu", "org", "net", "com"],
    "nz": ["ac", "co", "cri", "geek", "gen", "govt", "health", "iwi",
           "kiwi", "maori", "mil", "net", "org", "parliament", "school"],
    "om": ["co", "com", "edu", "gov", "med", "museum", "net", "org", "pro"],
    "pa": ["ac", "gob", "com", "org", "sld", "edu", "net", "ing", "abo",
           "med", "nom"],
    "pe": ["edu", "gob", "nom", "mil", "org", "com", "net"],
    "pf": ["com", "org", "edu"],
    "ph": ["com", "net", "org", "gov", "edu", "ngo", "mil", "i"],
    "pk": ["com", "net", "edu", "org", "fam", "biz", "web", "gov", "gob",
           "gok", "gon", "gop", "gos", "info"],
    "pl": ["com", "net", "org", "aid", "agro", "atm", "auto", "biz",
           "edu", "gmina", "gsm", "info", "mail", "miasta", "media",
           "mil", "nieruchomosci", "nom", "pc", "powiat", "priv",
           "realestate", "rel", "sex", "shop", "sklep", "sos", "szkola",
           "targi", "tm", "tourism", "travel", "turystyka", "gov",
           "waw", "warszawa", "wroc", "wroclaw", "krakow", "katowice",
           "poznan", "lodz", "gda", "gdansk", "gdynia", "sopot", "szczecin",
           "lublin", "bialystok", "olsztyn", "torun", "rzeszow"],
    "pr": ["com", "net", "org", "gov", "edu", "isla", "pro", "biz",
           "info", "name", "est", "prof", "ac"],
    "ps": ["edu", "gov", "sec", "plo", "com", "org", "net"],
    "pt": ["net", "gov", "org", "edu", "int", "publ", "com", "nome"],
    "py": ["com", "coop", "edu", "gov", "mil", "net", "org"],
    "qa": ["com", "edu", "gov", "mil", "name", "net", "org", "sch"],
    "re": ["asso", "com", "nom"],
    "ro": ["arts", "com", "firm", "info", "nom", "nt", "org", "rec",
           "store", "tm", "www"],
    "rs": ["ac", "co", "edu", "gov", "in", "org"],
    "ru": ["ac", "com", "edu", "int", "net", "org", "pp", "gov", "mil",
           "msk", "spb"],
    "rw": ["gov", "net", "edu", "ac", "com", "co", "int", "mil", "gouv"],
    "sa": ["com", "net", "org", "gov", "med", "pub", "edu", "sch"],
    "sb": ["com", "edu", "gov", "net", "org"],
    "sc": ["com", "gov", "net", "org", "edu"],
    "sd": ["com", "net", "org", "edu", "med", "tv", "gov", "info"],
    "se": ["a", "ac", "b", "bd", "brand", "c", "d", "e", "f", "fh",
           "fhsk", "fhv", "g", "h", "i", "k", "komforb",
           "kommunalforbund", "komvux", "l", "lanbib", "m", "n",
           "naturbruksgymn", "o", "org", "p", "parti", "pp", "press",
           "r", "s", "t", "tm", "u", "w", "x", "y", "z"],
    "sg": ["com", "net", "org", "gov", "edu", "per"],
    "sh": ["com", "net", "gov", "org", "mil"],
    "sl": ["com", "net", "edu", "gov", "org"],
    "sn": ["art", "com", "edu", "gouv", "org", "perso", "univ"],
    "so": ["com", "edu", "gov", "me", "net", "org"],
    "ss": ["biz", "com", "edu", "gov", "me", "net", "org", "sch"],
    "st": ["co", "com", "consulado", "edu", "embaixada", "mil", "net",
           "org", "principe", "saotome", "store"],
    "sv": ["com", "edu", "gob", "org", "red"],
    "sx": ["gov"],
    "sy": ["edu", "gov", "net", "mil", "com", "org"],
    "sz": ["co", "ac", "org"],
    "th": ["ac", "co", "go", "in", "mi", "net", "or"],
    "tj": ["ac", "biz", "co", "com", "edu", "go", "gov", "int", "mil",
           "name", "net", "nic", "org", "test", "web"],
    "tl": ["gov"],
    "tm": ["com", "co", "org", "net", "nom", "gov", "mil", "edu"],
    "tn": ["com", "ens", "fin", "gov", "ind", "info", "intl", "mincom",
           "nat", "net", "org", "perso", "tourism"],
    "to": ["com", "gov", "net", "org", "edu", "mil"],
    "tr": ["av", "bbs", "bel", "biz", "com", "dr", "edu", "gen", "gov",
           "info", "mil", "k12", "kep", "name", "net", "org", "pol",
           "tel", "tsk", "tv", "web"],
    "tt": ["co", "com", "org", "net", "biz", "info", "pro", "int",
           "coop", "jobs", "mobi", "travel", "museum", "aero", "name",
           "gov", "edu"],
    "tw": ["edu", "gov", "mil", "com", "net", "org", "idv", "game",
           "ebiz", "club"],
    "tz": ["ac", "co", "go", "hotel", "info", "me", "mil", "mobi", "ne",
           "or", "sc", "tv"],
    "ua": ["com", "edu", "gov", "in", "net", "org",
           "cherkassy", "chernigov", "crimea", "dnepropetrovsk", "donetsk",
           "kharkov", "kherson", "kiev", "kirovograd", "lugansk", "lutsk",
           "lviv", "nikolaev", "odessa", "poltava", "rovno", "sebastopol",
           "sumy", "ternopil", "uzhgorod", "vinnica", "zaporizhzhe",
           "zhitomir"],
    "ug": ["co", "or", "ac", "sc", "go", "ne", "com", "org"],
    "uk": ["ac", "co", "gov", "ltd", "me", "net", "nhs", "org", "plc",
           "police", "sch"],
    "uy": ["com", "edu", "gub", "mil", "net", "org"],
    "uz": ["co", "com", "net", "org"],
    "vc": ["com", "net", "org", "gov", "mil", "edu"],
    "ve": ["arts", "bib", "co", "com", "e12", "edu", "firm", "gob",
           "gov", "info", "int", "mil", "net", "nom", "org", "rec",
           "store", "tec", "web"],
    "vi": ["co", "com", "k12", "net", "org"],
    "vn": ["com", "net", "org", "edu", "gov", "int", "ac", "biz",
           "info", "name", "pro", "health"],
    "vu": ["com", "edu", "net", "org"],
    "ws": ["com", "net", "org", "gov", "edu"],
    "ye": ["com", "edu", "gov", "net", "mil", "org"],
    "za": ["ac", "agric", "alt", "co", "edu", "gov", "grondar", "law",
           "mil", "net", "ngo", "nis", "nom", "org", "school", "tm", "web"],
    "zm": ["ac", "biz", "co", "com", "edu", "gov", "info", "mil", "net",
           "org", "sch"],
    "zw": ["ac", "co", "gov", "mil", "org"],
}

US_STATES = [
    "al", "ak", "az", "ar", "ca", "co", "ct", "de", "fl", "ga", "hi",
    "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me", "mi",
    "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm", "nv",
    "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx", "ut",
    "va", "vt", "wa", "wi", "wv", "wy", "dc",
]

AWS_REGIONS = [
    "us-east-1", "us-east-2", "us-west-1", "us-west-2",
    "af-south-1", "ap-east-1", "ap-south-1", "ap-northeast-1",
    "ap-northeast-2", "ap-northeast-3", "ap-southeast-1",
    "ap-southeast-2", "ap-southeast-3", "ca-central-1",
    "eu-central-1", "eu-north-1", "eu-south-1", "eu-west-1",
    "eu-west-2", "eu-west-3", "me-south-1", "sa-east-1",
]

BLOGSPOT = [
    "ae", "al", "am", "ba", "be", "bg", "bj", "ca", "cf", "ch", "cl",
    "co.at", "co.id", "co.il", "co.ke", "co.nz", "co.uk", "co.za",
    "com", "com.ar", "com.au", "com.br", "com.by", "com.co", "com.cy",
    "com.ee", "com.eg", "com.es", "com.mt", "com.ng", "com.tr",
    "com.uy", "cv", "cz", "de", "dk", "fi", "fr", "gr", "hk", "hr",
    "hu", "ie", "in", "is", "it", "jp", "kr", "li", "lt", "lu", "md",
    "mk", "mr", "mx", "my", "nl", "no", "pe", "pt", "qa", "re", "ro",
    "rs", "ru", "se", "sg", "si", "sk", "sn", "td", "tw", "ug", "vn",
]

PRIVATE = [
    # code / pages hosting
    "github.io", "githubusercontent.com", "gitlab.io", "bitbucket.io",
    "codeberg.page", "sourceforge.io", "readthedocs.io", "gitbook.io",
    # PaaS / serverless
    "herokuapp.com", "herokussl.com", "appspot.com", "firebaseapp.com",
    "web.app", "run.app", "cloudfunctions.net", "googleapis.com",
    "azurewebsites.net", "cloudapp.net", "azurestaticapps.net",
    "azureedge.net", "trafficmanager.net", "sharepoint.com",
    "netlify.app", "vercel.app", "now.sh", "pages.dev", "workers.dev",
    "r2.dev", "trycloudflare.com", "glitch.me", "repl.co", "replit.app",
    "replit.dev", "onrender.com", "fly.dev", "deno.dev", "surge.sh",
    "amplifyapp.com", "elasticbeanstalk.com", "awsglobalaccelerator.com",
    "oraclecloudapps.com", "ondigitalocean.app", "digitaloceanspaces.com",
    "pythonanywhere.com", "eu.pythonanywhere.com", "streamlit.app",
    "hf.space", "ngrok.io", "ngrok.app", "ngrok.dev",
    # site builders / blogs
    "wordpress.com", "files.wordpress.com", "wixsite.com", "webflow.io",
    "ghost.io", "notion.site", "framer.app", "neocities.org",
    "hashnode.dev", "myshopify.com",
    # CDNs with per-customer hostnames
    "cloudfront.net", "b-cdn.net", "akamaized.net", "akamaihd.net",
    "edgekey.net", "map.fastly.net", "freetls.fastly.net",
    "global.ssl.fastly.net", "global.prod.fastly.net",
    # AWS storage/compute endpoints (exact regional entries in lieu of
    # the upstream wildcard rules, which this curated set does not model)
    "s3.amazonaws.com", "s3-website-us-east-1.amazonaws.com",
    "compute.amazonaws.com", "compute-1.amazonaws.com",
    "elb.amazonaws.com",
    # dynamic-DNS
    "duckdns.org", "dyndns.org", "dyndns.info", "no-ip.com", "no-ip.org",
    "no-ip.biz", "hopto.org", "zapto.org", "sytes.net", "ddns.net",
    "dynv6.net", "mooo.com",
    # JP shared hosting
    "sakura.ne.jp",
]


def build():
    entries = set()
    for cc, seconds in sorted(CC_SECOND_LEVELS.items()):
        for s in seconds:
            entries.add(f"{s}.{cc}")
    for st in US_STATES:
        entries.add(f"{st}.us")
        for tier in ("k12", "cc", "lib"):
            entries.add(f"{tier}.{st}.us")
    for st in ("act", "nsw", "nt", "qld", "sa", "tas", "vic", "wa"):
        entries.add(f"{st}.edu.au")
        entries.add(f"{st}.gov.au")
    entries.add("fed.us")
    entries.add("isa.us")
    entries.add("nsn.us")
    entries.add("dni.us")
    entries.add("kids.us")
    for b in BLOGSPOT:
        entries.add(f"blogspot.{b}")
    for r in AWS_REGIONS:
        entries.add(f"s3.{r}.amazonaws.com")
        entries.add(f"{r}.elb.amazonaws.com")
        entries.add(f"{r}.compute.amazonaws.com")
        entries.add(f"{r}.elasticbeanstalk.com")
    for p in PRIVATE:
        entries.add(p)
    return sorted(entries)


def main():
    out = os.path.join(
        os.path.dirname(__file__), "..",
        "src", "main", "resources", "graft", "public_suffix_list.txt")
    out = os.path.normpath(out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    entries = build()
    with open(out, "w") as f:
        f.write("# graft curated public-suffix list\n")
        f.write("# Generated by scripts/gen_psl.py — do not edit by hand.\n")
        f.write("# A curated subset of publicsuffix.org entries (exact rules\n")
        f.write("# only; no wildcard/exception rules). One suffix per line.\n")
        for e in entries:
            f.write(e + "\n")
    by_len = {}
    for e in entries:
        by_len.setdefault(e.count(".") + 1, []).append(e)
    print(f"wrote {len(entries)} suffixes to {out}")
    for k in sorted(by_len):
        print(f"  {k}-label: {len(by_len[k])}")


if __name__ == "__main__":
    main()
