"""Controlled vocabularies (OGM Aardvark spec) + language-code table.

Term data mirrors the public OpenGeoMetadata Aardvark spec
(https://opengeometadata.org/ogm-aardvark/) as used by the reference
(/root/reference/harvester/records/controlled_terms.py,
 formats/helpers.py:4-33). Terms are data, not code.

Language codes: pycountry is not installed in this container; a static
ISO-639 alpha2->alpha3 table covers the codes that occur in harvested
metadata (import-gated: if pycountry exists it wins).
"""

from __future__ import annotations

try:  # pragma: no cover - not in this container
    import pycountry

    HAVE_PYCOUNTRY = True
except Exception:
    pycountry = None
    HAVE_PYCOUNTRY = False

# dct_format_s controlled terms (https://opengeometadata.org/ogm-aardvark/#format)
DCT_FORMAT_S_OGM_TERMS = {
    "ArcGRID", "CD - ROM", "DEM", "DVD - ROM", "Feature", "Class",
    "Geodatabase", "GeoJPEG", "GeoJSON", "GeoPackage", "GeoPDF", "GeoTIFF",
    "JPEG", "JPEG2000", "KML", "KMZ", "LAS", "LAZ", "Mixed", "MrSID", "PDF",
    "PNG", "Pulsewaves", "Raster", "Dataset", "Shapefile", "SQLite",
    "Database", "Tabular", "Data", "TIFF",
}

# gbl_resourceType_sm: LOC terms (scanned maps)
GBL_RESOURCETYPE_SM_LOC_TERMS = {
    "Aerial photographs", "Aerial views", "Aeronautical charts",
    "Armillary spheres", "Astronautical charts", "Astronomical models",
    "Atlases", "Bathymetric maps", "Block diagrams", "Bottle-charts",
    "Cadastral maps", "Cartographic materials",
    "Cartographic materials for people with visual disabilities",
    "Celestial charts", "Celestial globes", "Census data",
    "Children's atlases", "Children's maps", "Comparative maps",
    "Composite atlases", "Digital elevation models", "Digital maps",
    "Early maps", "Ephemerides", "Ethnographic maps", "Fire insurance maps",
    "Flow maps", "Gazetteers", "Geological cross-sections", "Geological maps",
    "Globes", "Gores (Maps)", "Gravity anomaly maps", "Index maps",
    "Linguistic atlases", "Loran charts", "Manuscript maps", "Mappae mundi",
    "Mental maps", "Meteorological charts", "Military maps", "Mine maps",
    "Miniature maps", "Nautical charts", "Outline maps",
    "Photogrammetric maps", "Photomaps", "Physical maps", "Pictorial maps",
    "Plotting charts", "Portolan charts", "Quadrangle maps", "Relief models",
    "Remote-sensing maps", "Road maps", "Statistical maps", "Stick charts",
    "Strip maps", "Thematic maps", "Topographic maps", "Tourist maps",
    "Upside-down maps", "Wall maps", "World atlases", "World maps",
    "Worm's-eye views", "Zoning maps",
}

# gbl_resourceType_sm: OGM terms (geospatial data). NOTE the tab inside
# "Point cloud data\t" is present in the reference term set — kept verbatim
# for parity (controlled_terms.py:119).
GBL_RESOURCETYPE_SM_OGM_TERMS = {
    "Annotations", "Basemaps", "LiDAR", "Line data", "Mesh data",
    "Multi-spectral data", "Oblique photographs", "Point cloud data\t",
    "Point data", "Polygon data", "Raster data", "Satellite imagery",
    "Streetview photographs", "Table data",
}

GBL_RESOURCETYPE_SM_TERMS = (
    GBL_RESOURCETYPE_SM_LOC_TERMS | GBL_RESOURCETYPE_SM_OGM_TERMS
)

# gbl_resourceClass_sm value map shared by GBL1/Aardvark (helpers.py:4-33)
GBL_RESOURCE_CLASS_VALUE_MAP = {
    "attribute": None, "attributetype": None, "collectionhardware": None,
    "collectionsession": None, "collections": "Collections",
    "dataset": "Datasets", "datasets": "Datasets", "dimensiongroup": None,
    "feature": None, "featuretype": None, "fieldsession": None,
    "imagery": "Imagery", "maps": "Maps", "model": None,
    "nongeographicdataset": None, "other": "Other", "property": None,
    "series": None, "service": None, "software": None, "tile": None,
    "web services": "Web services", "websites": "Websites",
}

# ordered list: the enum order appears verbatim in jsonschema error
# messages, which the validator parity tests compare byte-for-byte
GBL_RESOURCE_CLASS_ENUM = [
    "Datasets", "Maps", "Imagery", "Collections", "Websites",
    "Web services", "Other",
]

# dcat_theme_sm controlled list (record.py:447-469)
DCAT_THEME_TERMS = [
    "agriculture", "biology", "boundaries", "climate", "economy",
    "elevation", "environment", "events", "geology", "health", "imagery",
    "inland waters", "land cover", "location", "military", "oceans",
    "property", "society", "structure", "transportation", "utilities",
]

# Complete ISO 639-1 (alpha2) -> ISO 639-3 (alpha3) mapping — the embedded
# twin of pycountry's `languages.get(alpha_2=code).alpha_3` (utils.py:75-83;
# the pycountry wheel is absent in this container). All 183 current 639-1
# codes, mapped to 639-3 identifiers (which equal the 639-2/T codes).
ISO639_2TO3 = {
    "aa": "aar", "ab": "abk", "ae": "ave", "af": "afr", "ak": "aka",
    "am": "amh", "an": "arg", "ar": "ara", "as": "asm", "av": "ava",
    "ay": "aym", "az": "aze", "ba": "bak", "be": "bel", "bg": "bul",
    "bi": "bis", "bm": "bam", "bn": "ben", "bo": "bod", "br": "bre",
    "bs": "bos", "ca": "cat", "ce": "che", "ch": "cha", "co": "cos",
    "cr": "cre", "cs": "ces", "cu": "chu", "cv": "chv", "cy": "cym",
    "da": "dan", "de": "deu", "dv": "div", "dz": "dzo", "ee": "ewe",
    "el": "ell", "en": "eng", "eo": "epo", "es": "spa", "et": "est",
    "eu": "eus", "fa": "fas", "ff": "ful", "fi": "fin", "fj": "fij",
    "fo": "fao", "fr": "fra", "fy": "fry", "ga": "gle", "gd": "gla",
    "gl": "glg", "gn": "grn", "gu": "guj", "gv": "glv", "ha": "hau",
    "he": "heb", "hi": "hin", "ho": "hmo", "hr": "hrv", "ht": "hat",
    "hu": "hun", "hy": "hye", "hz": "her", "ia": "ina", "id": "ind",
    "ie": "ile", "ig": "ibo", "ii": "iii", "ik": "ipk", "io": "ido",
    "is": "isl", "it": "ita", "iu": "iku", "ja": "jpn", "jv": "jav",
    "ka": "kat", "kg": "kon", "ki": "kik", "kj": "kua", "kk": "kaz",
    "kl": "kal", "km": "khm", "kn": "kan", "ko": "kor", "kr": "kau",
    "ks": "kas", "ku": "kur", "kv": "kom", "kw": "cor", "ky": "kir",
    "la": "lat", "lb": "ltz", "lg": "lug", "li": "lim", "ln": "lin",
    "lo": "lao", "lt": "lit", "lu": "lub", "lv": "lav", "mg": "mlg",
    "mh": "mah", "mi": "mri", "mk": "mkd", "ml": "mal", "mn": "mon",
    "mr": "mar", "ms": "msa", "mt": "mlt", "my": "mya", "na": "nau",
    "nb": "nob", "nd": "nde", "ne": "nep", "ng": "ndo", "nl": "nld",
    "nn": "nno", "no": "nor", "nr": "nbl", "nv": "nav", "ny": "nya",
    "oc": "oci", "oj": "oji", "om": "orm", "or": "ori", "os": "oss",
    "pa": "pan", "pi": "pli", "pl": "pol", "ps": "pus", "pt": "por",
    "qu": "que", "rm": "roh", "rn": "run", "ro": "ron", "ru": "rus",
    "rw": "kin", "sa": "san", "sc": "srd", "sd": "snd", "se": "sme",
    "sg": "sag", "si": "sin", "sk": "slk", "sl": "slv", "sm": "smo",
    "sn": "sna", "so": "som", "sq": "sqi", "sr": "srp", "ss": "ssw",
    "st": "sot", "su": "sun", "sv": "swe", "sw": "swa", "ta": "tam",
    "te": "tel", "tg": "tgk", "th": "tha", "ti": "tir", "tk": "tuk",
    "tl": "tgl", "tn": "tsn", "to": "ton", "tr": "tur", "ts": "tso",
    "tt": "tat", "tw": "twi", "ty": "tah", "ug": "uig", "uk": "ukr",
    "ur": "urd", "uz": "uzb", "ve": "ven", "vi": "vie", "vo": "vol",
    "wa": "wln", "wo": "wol", "xh": "xho", "yi": "yid", "yo": "yor",
    "za": "zha", "zh": "zho", "zu": "zul",
}

# Accepted alpha-3 identifiers: the 639-3 ids above plus the remaining
# ISO 639-2/T-only codes (historic, regional, collective and special codes
# common in library metadata). NOTE pycountry's alpha_3 index holds 639-3
# IDENTIFIERS only — bibliographic variants ('ger','fre','cze',...) resolve
# to None there, so they are deliberately NOT in this set (tested against
# the reference behavior in tests/test_reference_parity.py).
ISO639_ALPHA3 = set(ISO639_2TO3.values()) | {
    # historic / ancient
    "ang", "arc", "chg", "cop", "dum", "egy", "enm", "frm", "fro", "gez",
    "gmh", "goh", "got", "grc", "hit", "kaw", "lad", "mga", "nwc", "non",
    "ota", "pal", "peo", "phn", "pro", "sam", "sga", "sog", "syc", "uga",
    # regional / minority / other living languages in 639-2
    "ace", "ach", "ada", "ady", "afh", "ain", "akk", "ale", "alt", "anp",
    "arn", "arp", "arw", "ast", "awa", "bal", "ban", "bas", "bej", "bem",
    "bho", "bin", "bla", "bra", "bua", "bug", "byn", "cad", "car", "ceb",
    "chk", "chm", "chn", "cho", "chp", "chr", "chy", "crh", "csb", "dak",
    "dar", "del", "den", "dgr", "din", "doi", "dsb", "dua", "dyu", "efi",
    "eka", "elx", "ewo", "fan", "fat", "fil", "fon", "frr", "frs", "fur",
    "gaa", "gay", "gba", "gil", "gon", "gor", "grb", "gsw", "gwi", "hai",
    "haw", "hil", "hmn", "hsb", "hup", "iba", "ilo", "inh", "jbo", "jpr",
    "jrb", "kaa", "kab", "kac", "kam", "kbd", "kha", "kho", "kmb", "kok",
    "kos", "kpe", "krc", "krl", "kru", "kum", "kut", "lah", "lam", "lez",
    "lol", "loz", "lua", "lui", "lun", "luo", "lus", "mad", "mag", "mai",
    "mak", "mas", "mdf", "mdr", "men", "mic", "min", "mnc", "mni", "moh",
    "mos", "mus", "mwl", "mwr", "myv", "nap", "nds", "new", "nia", "niu",
    "nog", "nqo", "nso", "nym", "nyn", "nyo", "nzi", "osa", "pag", "pam",
    "pap", "pau", "pon", "raj", "rap", "rar", "rom", "rup", "sad", "sah",
    "sas", "sat", "scn", "sco", "sel", "shn", "sid", "sma", "smj", "smn",
    "sms", "snk", "srn", "srr", "suk", "sus", "syr", "tem", "ter", "tet",
    "tig", "tiv", "tkl", "tlh", "tli", "tmh", "tog", "tpi", "tsi", "tum",
    "tvl", "tyv", "udm", "umb", "vai", "vot", "war", "was", "xal", "yao",
    "yap", "yue", "zap", "zen", "zgh", "zun",
    # special codes (valid 639-3 / 639-2)
    "mis", "mul", "und", "zxx",
}


def convert_lang_code(code: str) -> str | None:
    """2/3-letter language code -> 3-letter ISO 639-2 (utils.py:75-83).

    None for unknown codes or lengths other than 2/3.
    """
    if HAVE_PYCOUNTRY:  # pragma: no cover
        if len(code) == 2:
            lang = pycountry.languages.get(alpha_2=code)
        elif len(code) == 3:
            lang = pycountry.languages.get(alpha_3=code)
        else:
            return None
        return lang.alpha_3 if lang else None
    if len(code) == 2:
        return ISO639_2TO3.get(code.lower())
    if len(code) == 3:
        c = code.lower()
        return c if c in ISO639_ALPHA3 else None
    return None
