import cProfile, pstats, sys, io, time
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.plans import build_imputaciones
from data_management_service_run_etl_imputations_spark.plans.fixtures import build_fixture_frames
spark = get_session(app_name="profbuild"); spark.sparkContext.setLogLevel("ERROR")
fx = build_fixture_frames(spark)
out = build_imputaciones(fx["time_entries"], fx["employees"], fx["dim_empleado"], fx["dim_empresa"], fx["dim_departamento"], fx["department_assignations"])
out.localCheckpoint()  # warm
pr = cProfile.Profile(); pr.enable()
t0=time.perf_counter()
fx = build_fixture_frames(spark)
out = build_imputaciones(fx["time_entries"], fx["employees"], fx["dim_empleado"], fx["dim_empresa"], fx["dim_departamento"], fx["department_assignations"])
t1=time.perf_counter()
pr.disable()
print(f"build wall: {t1-t0:.3f}s")
s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18); print(s.getvalue())
