import cProfile, pstats, sys, os, io
sys.path.insert(0, "/root/repo")
from data_management_service_run_etl_imputations_spark import catalog
from data_management_service_run_etl_imputations_spark.session import get_session
spark = get_session(app_name="prof")
spark.sparkContext.setLogLevel("ERROR")
reg = catalog.queries()
name = sys.argv[1]
reg["flagship_daily_customer_revenue"](spark, "/root/testdata/sf0.1").limit(1).collect()
reg[name](spark, "/root/testdata/sf0.1").write.mode("overwrite").format("noop").save()  # warm rep
pr = cProfile.Profile()
pr.enable()
reg[name](spark, "/root/testdata/sf0.1").write.mode("overwrite").format("noop").save()
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(45)
print(s.getvalue())
