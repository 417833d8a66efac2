import sys, json
sys.path.insert(0, "/root/repo")
from simple_data_workflow_spark.session import get_spark
from simple_data_workflow_spark.sources.readers import load_table
from simple_data_workflow_spark.llmdata.similarity import fit_pq_codebooks, fit_ivf_centroids
from concurrent.futures import ThreadPoolExecutor
spark = get_spark(app_name="fit-identity")
spark.sparkContext.setLogLevel("ERROR")
emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
# serial (the old order)
cb_s = fit_pq_codebooks(emb, m=16, k_codes=256, seed=42, sample=10000)
iv_s = fit_ivf_centroids(emb, n_lists=16, seed=42)
# concurrent (the new build_pq_index shape)
with ThreadPoolExecutor(max_workers=2) as pool:
    cb_f = pool.submit(fit_pq_codebooks, emb, m=16, k_codes=256, seed=42, sample=10000)
    iv_f = pool.submit(fit_ivf_centroids, emb, n_lists=16, seed=42)
    cb_c, iv_c = cb_f.result(), iv_f.result()
print("codebooks identical:", cb_s == cb_c)
print("ivf centroids identical:", iv_s == iv_c)
spark.stop()
