"""CRS input normalization — ported accept/reject matrix from the
reference's tests/test_crs.py over the from_user_input dispatch
(reference crs.pyx:816-850, from_string :876-938, from_epsg :616-658).

The engine normalizes every accepted form to an "EPSG:n" string; only
the 4326<->3857 pair projects (SURVEY.md §1.1) — other codes normalize
fine and error at transform time."""

import pytest

from rasterio_spark.grid.crs import (
    CRSError,
    crs_equal,
    from_authority,
    from_dict,
    from_epsg,
    from_proj4,
    from_string,
    from_user_input,
    from_wkt,
    normalize_crs,
    to_epsg,
    transform_points,
)

WGS84_WKT1 = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563,'
    'AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0,'
    'AUTHORITY["EPSG","8901"]],UNIT["degree",0.0174532925199433,'
    'AUTHORITY["EPSG","9122"]],AUTHORITY["EPSG","4326"]]'
)
MERC_WKT2_ID = 'PROJCRS["WGS 84 / Pseudo-Mercator",BASEGEOGCRS["WGS 84"],ID["EPSG",3857]]'


def test_from_epsg():
    # reference test_from_epsg / _fail / _overflow
    assert from_epsg(4326) == "EPSG:4326"
    assert from_epsg("3857") == "EPSG:3857"
    with pytest.raises(CRSError, match="positive"):
        from_epsg(0)
    with pytest.raises(CRSError, match="positive"):
        from_epsg(-1)
    with pytest.raises(CRSError, match="range"):
        from_epsg(1111111111111111111111)
    with pytest.raises(CRSError):
        from_epsg("xyz")


def test_from_string_epsg():
    # reference test_from_epsg_string / _fail
    assert from_string("epsg:4326") == "EPSG:4326"
    assert from_string("EPSG:3857") == "EPSG:3857"
    with pytest.raises(CRSError):
        from_string("epsg:xyz")
    with pytest.raises(CRSError):
        from_string("EPSG:")


@pytest.mark.parametrize("arg", ["{}", "[]", ""])
def test_empty_json_rejected(arg):
    # reference test_empty_json
    with pytest.raises(CRSError):
        from_string(arg)


def test_invalid_json_rejected():
    # reference: CRS.from_string("{foo: bar}")
    with pytest.raises(CRSError, match="JSON"):
        from_string("{foo: bar}")


def test_from_proj4_strings():
    # reference test_from_string / test_from_string_2 / latlong alias
    assert from_string("+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs") == "EPSG:4326"
    assert from_string("+init=epsg:26911") == "EPSG:26911"
    assert crs_equal(
        "+proj=longlat +datum=WGS84 +no_defs", "+proj=latlong +datum=WGS84 +no_defs"
    )
    # spherical web mercator params
    assert from_proj4(
        "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m +no_defs"
    ) == "EPSG:3857"
    # reference's false-valued-param filter
    assert from_proj4("+proj=longlat +datum=WGS84 +over=false") == "EPSG:4326"
    # r5: parameterized conic CRSs normalize to a canonical spec the
    # transform hub resolves (grid/conic.py)
    assert from_proj4("+proj=lcc +lat_1=33 +lat_2=45").startswith("PROJ4:+proj=lcc")
    with pytest.raises(CRSError):
        from_proj4("")


def test_from_dict():
    # reference test_equality_from_dict / test_to_string
    assert from_dict(init="epsg:4326") == "EPSG:4326"
    assert from_dict({"init": "epsg:3857"}) == "EPSG:3857"
    assert from_dict({"proj": "longlat", "datum": "WGS84", "no_defs": True}) == "EPSG:4326"
    with pytest.raises(CRSError):
        from_dict({})
    with pytest.raises(CRSError):
        from_dict({"proj": "lcc"})  # degenerate: equator parallels -> cylinder


def test_from_wkt():
    assert from_wkt(WGS84_WKT1) == "EPSG:4326"  # last AUTHORITY wins (dataset-level)
    assert from_wkt(MERC_WKT2_ID) == "EPSG:3857"  # WKT2 ID[] form
    assert from_wkt('GEOGCS["WGS 84",DATUM["WGS_1984"]]') == "EPSG:4326"  # name fallback
    with pytest.raises(CRSError):
        from_wkt('PROJCS["Some Local Grid",GEOGCS["local"]]')
    with pytest.raises(CRSError):
        from_wkt("not wkt")


def test_from_user_input_dispatch():
    # reference crs.pyx:816-850: int / dict / str / CRS-like / invalid
    assert from_user_input(4326) == "EPSG:4326"
    assert from_user_input({"init": "epsg:4326"}) == "EPSG:4326"
    assert from_user_input("EPSG:3857") == "EPSG:3857"
    assert from_user_input(WGS84_WKT1) == "EPSG:4326"

    class FakeCRS:
        def to_wkt(self):
            return WGS84_WKT1

    assert from_user_input(FakeCRS()) == "EPSG:4326"
    for bad in (None, 3.14, True, object()):
        with pytest.raises(CRSError):
            from_user_input(bad)


def test_urn_and_aliases():
    # reference test_crs84 / test_epsg_treats_as_latlong
    assert from_string("OGC:CRS84") == "EPSG:4326"
    assert from_string("urn:ogc:def:crs:OGC:1.3:CRS84") == "EPSG:4326"
    assert from_string("urn:ogc:def:crs:EPSG::4326") == "EPSG:4326"
    assert from_string("WGS84") == "EPSG:4326"
    assert crs_equal("EPSG:4326", "OGC:CRS84")


def test_from_authority():
    assert from_authority("EPSG", 3857) == "EPSG:3857"
    assert from_authority("OGC", "CRS84") == "EPSG:4326"
    with pytest.raises(CRSError):
        from_authority("ESRI", 102100)


def test_to_epsg():
    # reference test_to_epsg
    assert to_epsg("+proj=longlat +datum=WGS84 +no_defs") == 4326
    assert to_epsg(4326) == 4326
    assert to_epsg("EPSG:26911") == 26911
    assert to_epsg("something else entirely") is None


def test_normalize_feeds_operators():
    """Every accepted form drives the actual transform — callers no
    longer hand-write 'EPSG:4326'."""
    import numpy as np

    for src in (4326, {"init": "epsg:4326"}, "+proj=longlat +datum=WGS84", WGS84_WKT1):
        x, y = transform_points(normalize_crs(src), "EPSG:3857", [0.0], [0.0])
        assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    # unsupported pair errors at transform time, not parse time
    # (26911 GRADUATED to supported in r5 — NY State Plane ftUS 2263
    # stays out: non-meter units / NAD83 zone math the engine doesn't ship)
    assert normalize_crs(2263) == "EPSG:2263"
    with pytest.raises(ValueError, match="unsupported CRS pair"):
        transform_points("EPSG:2263", "EPSG:3857", np.array([0.0]), np.array([0.0]))


def test_epsg_roundtrip_property():
    """from_string(from_epsg(n)) is the identity for any valid code."""
    from hypothesis import given, strategies as st

    @given(st.integers(min_value=1, max_value=2**31 - 1))
    def check(n):
        s = from_epsg(n)
        assert from_string(s) == s == f"EPSG:{n}"
        assert to_epsg(s) == n

    check()


def test_none_crs_rejected_everywhere():
    """Ported reference test_warp.py:176-227 (None src/dst CRS raises
    CRSError) over the engine's transform surface."""
    from rasterio_spark.grid.crs import transform_bounds, transform_geom

    pt = {"type": "Point", "coordinates": [1.0, 1.0]}
    for src, dst in ((None, "EPSG:4326"), ("EPSG:4326", None)):
        with pytest.raises(CRSError):
            transform_points(src, dst, [1.0], [1.0])
        with pytest.raises(CRSError):
            transform_bounds(src, dst, 0, 0, 1, 1)
        with pytest.raises(CRSError):
            transform_geom(src, dst, pt)


def test_transform_bounds_same_crs_no_change():
    """Ported reference test_transform_bounds_no_change."""
    import numpy as np

    from rasterio_spark.grid.crs import transform_bounds

    b = (-78.95864996545055, 23.564991210854686, -76.57492370013823, 25.550873767433984)
    assert np.allclose(transform_bounds("EPSG:4326", "EPSG:4326", *b), b)


def test_transform_bounds_negative_densify_rejected():
    """Ported reference test_transform_bounds_densify_out_of_bounds."""
    from rasterio_spark.grid.crs import transform_bounds

    with pytest.raises(ValueError):
        transform_bounds("EPSG:4326", "EPSG:3857", -120, 40, -80, 64, densify_pts=-10)


def test_from_wkt_inner_authority_not_trusted():
    """Review fix r4: inner UNIT/DATUM authority clauses must not
    identify the CRS when the dataset-level authority is absent —
    better to error than to normalize a projected CRS to its unit code
    or base-geographic code."""
    stripped = (
        'PROJCS["Custom Grid",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],'
        'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]]],'
        'PROJECTION["Lambert_Conformal_Conic_2SP"],'
        'UNIT["metre",1,AUTHORITY["EPSG","9001"]]],EXTRA["x"]'
    )
    with pytest.raises(CRSError):
        from_wkt(stripped + "]")
    # but a true dataset-level trailing authority still resolves
    assert from_wkt(WGS84_WKT1) == "EPSG:4326"


def test_epsg_double_colon_form():
    """Review fix r4: the authority form EPSG::n is accepted (the old
    handler was unreachable); junk between colons still errors."""
    assert from_string("EPSG::4326") == "EPSG:4326"
    assert from_user_input("epsg::3857") == "EPSG:3857"
    with pytest.raises(CRSError):
        from_string("EPSG:x:4326")


def test_json_array_string_raises_crserror():
    """Review fix r4: a JSON array parses but is not a PROJ dict —
    CRSError, not TypeError (normalize_crs's lenient fallback relies
    on catching CRSError only)."""
    with pytest.raises(CRSError, match="object of PROJ params"):
        from_string("[1, 2]")
    assert normalize_crs("[1, 2]") == "[1,2]"  # lenient pass-through survives


# --------------------------------------------------------- exporters (r5)


def test_exporters_round_trip_every_registry_family():
    """to_dict/to_proj4 ROUND-TRIP through from_dict/from_proj4 for one
    representative of every registry family (reference crs.pyx
    to_dict/to_proj4/to_authority/to_wkt surface)."""
    from rasterio_spark.grid import cylindrical as C
    from rasterio_spark.grid.crs import to_dict, to_proj4, to_wkt, to_authority

    codes = [
        "EPSG:4326", "EPSG:4269", "EPSG:3857", "EPSG:3395", "EPSG:32618",
        "EPSG:32755", "EPSG:26911", "EPSG:2193", "EPSG:32661", "EPSG:3413",
        "EPSG:3031", "EPSG:3032", "EPSG:2154", "EPSG:5070", "EPSG:3577",
        "EPSG:3035", "EPSG:4087", C.MODIS_SINU,
        "PROJ4:+proj=stere +lat_0=90.0 +lon_0=10.0 +k_0=0.93 +x_0=0.0 +y_0=0.0",
    ]
    for c in codes:
        assert from_dict(to_dict(c)) == normalize_crs(c), c
        assert from_proj4(to_proj4(c)) == normalize_crs(c), c
    # WKT carries the dataset-level EPSG identifier our own parser reads
    for c in ("EPSG:4326", "EPSG:3413", "EPSG:4087"):
        assert from_wkt(to_wkt(c)) == c
    assert to_authority("EPSG:3031") == ("EPSG", "3031")
    assert to_authority(C.MODIS_SINU) is None


def test_exporters_reject_ambiguous_proj4():
    """Codes whose PROJ4 is identical to another CRS's (bare-GRS80
    geographic aliases, ETRS89/GDA94 UTM) refuse lossy export; specs
    without an EPSG authority refuse WKT."""
    from rasterio_spark.grid import cylindrical as C
    from rasterio_spark.grid.crs import to_dict, to_wkt

    with pytest.raises(CRSError, match="no unambiguous"):
        to_dict("EPSG:4258")
    with pytest.raises(CRSError, match="no unambiguous"):
        to_dict("EPSG:25832")
    with pytest.raises(CRSError, match="authority"):
        to_wkt(C.MODIS_SINU)


def test_merc_dict_is_ellipsoidal_3395():
    """+proj=merc on the WGS84 ellipsoid (no +a/+b sphere override) is
    World Mercator EPSG:3395; the sphere form stays web mercator. The
    reference reaches the same answers through PROJ."""
    assert from_proj4("+proj=merc +datum=WGS84 +units=m +no_defs") == "EPSG:3395"
    assert from_proj4(
        "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 "
        "+x_0=0 +y_0=0 +k=1 +units=m +no_defs"
    ) == "EPSG:3857"
    with pytest.raises(CRSError, match="natural-origin"):
        from_proj4("+proj=merc +lat_ts=45 +datum=WGS84")


def test_is_projected_predicate():
    from rasterio_spark.grid.crs import is_projected

    assert is_projected("EPSG:3413") and is_projected("EPSG:32618")
    assert not is_projected("EPSG:4326") and not is_projected(4269)
