"""One-time bench ingest: materialize the geocoded pages table."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rasterio_spark.plans.session import get_session
import bench
n = int(sys.argv[1]) if len(sys.argv) > 1 else 96_000_000
spark = get_session(app_name="ingest", cores=32, shuffle_partitions=64)
print("done", bench.ensure_pages(spark, n))
spark.stop()
