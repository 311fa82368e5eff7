"""Scalar/array derivation functions (SURVEY.md §2.7, F1-F14) as pure
Column builders — all JVM-side (higher-order array functions, no UDFs).

Behavioral parity targets cited per function into /root/reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hier_facet(levels: Column) -> Column:
    """F10 — generate_hier_facet(*levels) (adsmp/solr_updater.py:231-241):
    ``[a,b,c] -> ["0/a", "1/a/b", "2/a/b/c"]`` for a non-null prefix of
    levels. ``levels`` is an array column."""
    return F.transform(
        F.sequence(F.lit(0), F.size(levels) - 1),
        lambda i: F.concat_ws("/", F.array(i.cast("string")),
                              F.slice(levels, 1, i + 1)),
    )


def flat_hier_facets(entries: Column, splitter) -> Column:
    """Apply ``splitter(entry) -> array(levels)`` to each entry and
    flatten the per-entry hier facets (grants/simbad/ned pattern)."""
    return F.flatten(F.transform(entries, lambda x: hier_facet(splitter(x))))


def map_simbad_type(otype: Column) -> Column:
    """F8 — map_simbad_type (adsmp/solr_updater.py:255-278): SIMBAD
    native object type -> basic class."""
    return (
        F.when(otype.startswith("G") | otype.endswith("G"), "Galaxy")
        .when((otype == "Star") | otype.contains("*"), "Star")
        .when((otype == "Neb") | otype.startswith("PN") | otype.startswith("SNR"),
              "Nebula")
        .when(otype == "HII", "HII Region")
        .when(otype == "X", "X-ray")
        .when(otype.startswith("Radio") | (otype == "Maser") | (otype == "HI"),
              "Radio")
        .when((otype == "IR") | otype.startswith("Red"), "Infrared")
        .when(otype == "UV", "UV")
        .otherwise("Other")
    )


# NED lookup table (adsmp/solr_updater.py:289-325, `_o_types`)
_NED_O_TYPES = {
    **{x: "Galaxy" for x in ("G", "GClstr", "GGroup", "GPair", "GTrpl",
                             "G_Lens", "PofG")},
    **{x: "Nebula" for x in ("Neb", "PN", "RfN")},
    "HII": "HII Region", "X": "X-ray",
    **{x: "Radio" for x in ("Maser", "HI")},
    "IrS": "Infrared",
    **{x: "Star" for x in ("Blue*", "C*", "exG*", "Flare*", "Nova", "Psr",
                           "Red*", "SN", "SNR", "V*", "VisS", "WD*", "WR*")},
}


def map_ned_type(otype: Column) -> Column:
    """F9 — map_ned_type (adsmp/solr_updater.py:281-325): prefix rules,
    then the `_o_types` lookup table, else Other."""
    expr = F.lit("Other")
    # build the lookup as a CASE chain (table is small and static)
    for k, v in _NED_O_TYPES.items():
        expr = F.when(otype == k, v).otherwise(expr)
    return (
        F.when(otype.startswith("!"), "Galactic Object")
        .when(otype.startswith("*"), "Star")
        .when(otype.startswith("Uv"), "UV")
        .when(otype.startswith("Radio"), "Radio")
        .otherwise(expr)
    )


def split_id_type(entry: Column) -> tuple[Column, Column]:
    """F6/F7 shared shape — ``"id type".split(" ", 1)``; a missing type
    yields ``""`` (adsmp/solr_updater.py:76-112 fallback branch)."""
    sid = F.split(entry, " ", 2).getItem(0)
    stype = F.when(entry.contains(" "),
                   F.regexp_replace(entry, r"^[^ ]* ", "")).otherwise(F.lit(""))
    return sid, stype


def data_facet(data: Column) -> Column:
    """F11 — ``x.split(':')[0]`` over data (adsmp/solr_updater.py:122)."""
    return F.transform(data, lambda x: F.split(x, ":").getItem(0))


def solr_stamp(ts: Column) -> Column:
    """F14 — date2solrstamp ISO-8601 with microseconds and Z
    (adsmp/solr_updater.py:350-354)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")


def xml_escape(c: Column) -> Column:
    """F16 — html.escape of urls/bibcodes for XML templates
    (adsmp/templates/__init__.py:19-54)."""
    out = F.replace(c, F.lit("&"), F.lit("&amp;"))
    for raw, esc in (("<", "&lt;"), (">", "&gt;"),
                     ('"', "&quot;"), ("'", "&#x27;")):
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out
