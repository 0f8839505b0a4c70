import sys; sys.path.insert(0, "/root/repo")
import sys, json, math, time
import __spark_entry__ as e, duckdb
from smfg_datawarehouse_spark.session import get_spark
sf = sys.argv[1] if len(sys.argv) > 1 else 'sf0.01'
only = sys.argv[2:] if len(sys.argv) > 2 else None
spark = get_spark(app_name='diff-drive')
qs, os_ = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/{sf}/{t}.parquet'")
def norm(v):
    import decimal
    if isinstance(v, decimal.Decimal): v = float(v)
    if isinstance(v, float): return 'NaN' if math.isnan(v) else repr(v)
    return str(v)
fails = []
names = only if only else sorted(qs)
out = {}
for name in names:
    t0 = time.time()
    try:
        sdf = qs[name](spark, f'/root/testdata/{sf}')
        scols = sorted(sdf.columns)
        srows = sorted(','.join(norm(r[c]) for c in scols) for r in sdf.collect())
        res = con.execute(os_[name]); dcols = [d[0] for d in res.description]
        didx = {c: i for i, c in enumerate(dcols)}
        drows = sorted(','.join(norm(r[didx[c]]) for c in sorted(dcols)) for r in res.fetchall())
        ok = scols == sorted(dcols) and srows == drows
    except Exception as ex:
        ok = False; srows = [f'ERR {ex}'][:1]; drows=[]
    out[name] = {'match': ok, 'spark_rows': len(srows), 'oracle_rows': len(drows), 'sec': round(time.time()-t0,2)}
    print(name, 'MATCH' if ok else 'MISMATCH', flush=True)
    if not ok: fails.append(name)
print('FAILS:', fails)
json.dump(out, open(f'/tmp/diff_{sf}.json','w'), indent=1)
