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

GBL_RESOURCE_CLASS_ENUM = {
    "Datasets", "Maps", "Imagery", "Collections", "Websites",
    "Web services", "Other",
}

# dcat_theme_sm controlled list (record.py:447-469)
DCAT_THEME_TERMS = [
    "agriculture", "biology", "boundaries", "climate", "economy",
    "elevation", "environment", "events", "geology", "health", "imagery",
    "inland waters", "land cover", "location", "military", "oceans",
    "property", "society", "structure", "transportation", "utilities",
]

# ISO 639-1 (alpha2) -> ISO 639-2/T (alpha3), matching pycountry's alpha_3.
ISO639_2TO3 = {
    "aa": "aar", "ab": "abk", "af": "afr", "am": "amh", "ar": "ara",
    "az": "aze", "be": "bel", "bg": "bul", "bn": "ben", "bs": "bos",
    "ca": "cat", "cs": "ces", "cy": "cym", "da": "dan", "de": "deu",
    "el": "ell", "en": "eng", "eo": "epo", "es": "spa", "et": "est",
    "eu": "eus", "fa": "fas", "fi": "fin", "fr": "fra", "ga": "gle",
    "gl": "glg", "he": "heb", "hi": "hin", "hr": "hrv", "hu": "hun",
    "hy": "hye", "id": "ind", "is": "isl", "it": "ita", "ja": "jpn",
    "ka": "kat", "kk": "kaz", "km": "khm", "ko": "kor", "la": "lat",
    "lt": "lit", "lv": "lav", "mk": "mkd", "mn": "mon", "ms": "msa",
    "mt": "mlt", "nb": "nob", "ne": "nep", "nl": "nld", "nn": "nno",
    "no": "nor", "pa": "pan", "pl": "pol", "pt": "por", "ro": "ron",
    "ru": "rus", "sk": "slk", "sl": "slv", "sq": "sqi", "sr": "srp",
    "sv": "swe", "sw": "swa", "ta": "tam", "te": "tel", "th": "tha",
    "tr": "tur", "uk": "ukr", "ur": "urd", "uz": "uzb", "vi": "vie",
    "zh": "zho", "zu": "zul",
}

# Valid alpha-3 codes (identity mapping targets + common bibliographic codes
# that pycountry also resolves via alpha_3).
ISO639_ALPHA3 = set(ISO639_2TO3.values()) | {
    "chi", "dut", "fre", "ger", "gre", "ice", "mac", "may", "per", "rum",
    "slo", "sqi", "arm", "baq", "bur", "cze", "geo", "mao", "wel",
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
