""".prj (ESRI WKT1) CRS parser tests: real-world WKT strings for the CRSs
the engine warps natively (geographic, UTM/TM, Albers 5070, LCC state
plane), unit conversion, and loud failures on unsupported/malformed input.
A numeric closing test drives the parsed parameters through the actual
ellipsoidal TM kernel and checks a known EPSG:26915 correspondence."""

import math

import pytest

from demeter_spark.sources import prj

WGS84 = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433],'
    'AUTHORITY["EPSG",4326]]'
)

UTM15N = (
    'PROJCS["NAD_1983_UTM_Zone_15N",GEOGCS["GCS_North_American_1983",'
    'DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",500000.0],'
    'PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",-93.0],'
    'PARAMETER["Scale_Factor",0.9996],PARAMETER["Latitude_Of_Origin",0.0],'
    'UNIT["Meter",1.0],AUTHORITY["EPSG",26915]]'
)

CONUS_ALBERS = (
    'PROJCS["NAD_1983_Contiguous_USA_Albers",GEOGCS["GCS_North_American_1983",'
    'DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Albers"],PARAMETER["False_Easting",0.0],'
    'PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",-96.0],'
    'PARAMETER["Standard_Parallel_1",29.5],PARAMETER["Standard_Parallel_2",45.5],'
    'PARAMETER["Latitude_Of_Origin",23.0],UNIT["Meter",1.0],'
    'AUTHORITY["EPSG",5070]]'
)

NC_LCC_FEET = (
    'PROJCS["NAD_1983_StatePlane_North_Carolina_FIPS_3200_Feet",'
    'GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",'
    'SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],'
    'UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Lambert_Conformal_Conic"],'
    'PARAMETER["False_Easting",2000000.002616666],'
    'PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",-79.0],'
    'PARAMETER["Standard_Parallel_1",34.33333333333334],'
    'PARAMETER["Standard_Parallel_2",36.16666666666666],'
    'PARAMETER["Latitude_Of_Origin",33.75],'
    'UNIT["Foot_US",0.3048006096012192]]'
)

MERCATOR = (
    'PROJCS["World_Mercator",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],'
    'UNIT["Degree",0.0174532925199433]],PROJECTION["Mercator"],'
    'PARAMETER["Central_Meridian",0.0],UNIT["Meter",1.0]]'
)


def test_geographic():
    c = prj.crs_info(WGS84)
    assert c["kind"] == "geographic" and c["epsg"] == 4326
    assert c["a"] == 6378137.0 and c["inv_f"] == pytest.approx(298.257223563)
    e = prj.to_engine(WGS84)
    assert e["projection"] is None and e["epsg"] == 4326


def test_utm_tm_params():
    e = prj.to_engine(UTM15N)
    assert e["projection"] == "tm" and e["epsg"] == 26915
    assert (e["lon0"], e["k0"], e["lat0"]) == (-93.0, 0.9996, 0.0)
    assert (e["false_easting"], e["false_northing"]) == (500000.0, 0.0)
    assert e["inv_f"] == pytest.approx(298.257222101)


def test_albers_5070():
    e = prj.to_engine(CONUS_ALBERS)
    assert e["projection"] == "albers" and e["epsg"] == 5070
    assert (e["lat1"], e["lat2"], e["lat0"], e["lon0"]) == (29.5, 45.5, 23.0, -96.0)


def test_lcc_state_plane_feet_units():
    e = prj.to_engine(NC_LCC_FEET)
    assert e["projection"] == "lcc" and e["epsg"] is None
    assert (e["lat1"], e["lat2"]) == (
        pytest.approx(34.33333333333334),
        pytest.approx(36.16666666666666),
    )
    # false origin converted from US survey feet to meters
    assert e["false_easting"] == pytest.approx(2000000.002616666 * 0.3048006096012192)


def test_params_drive_the_tm_kernel(spark):
    """Parsed UTM15N parameters through the ellipsoidal TM kernel: the
    central meridian maps to x=0 (the kernel emits natural-origin meters;
    the parsed false_easting supplies the +500000 shift), and the northing
    at 43N matches k0 x the meridian arc computed by INDEPENDENT numeric
    integration of a(1-e2)/(1-e2 sin^2 t)^(3/2) (4760814.796 m)."""
    from pyspark.sql import functions as F

    from demeter_spark.operators import reproject

    e = prj.to_engine(UTM15N)
    t = reproject.lonlat_to_tm_ell(e["lon0"], k0=e["k0"], lat0=e["lat0"])
    x, y = t(F.col("lon"), F.col("lat"))
    row = (
        spark.createDataFrame([(-93.0, 43.0)], "lon DOUBLE, lat DOUBLE")
        .select(x.alias("x"), y.alias("y"))
        .first()
    )
    assert row["x"] == pytest.approx(0.0, abs=1e-6)
    assert row["y"] + e["false_northing"] == pytest.approx(4760814.796, abs=0.01)


@pytest.mark.parametrize(
    "text, match",
    [
        (MERCATOR, "no native kernel"),
        ('PROJCS["x",PROJECTION["Albers"]]', "without GEOGCS"),
        ("GARBAGE", "expected '\\['"),
        (WGS84 + "]", "trailing|bad WKT"),
        ('GEOGCS["g",DATUM["d"]]', "without SPHEROID"),
    ],
)
def test_failures_are_loud(text, match):
    with pytest.raises(ValueError, match=match):
        prj.to_engine(text)
