import time, pyspark.sql.functions as F
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master('local[8]').appName('vec_hof_probe')
         .config('spark.sql.shuffle.partitions', '8').getOrCreate())
spark.sparkContext.setLogLevel('ERROR')

# synthetic: 2M rows of 64-dim float arrays (deterministic, not testdata-keyed)
df = (spark.range(2_000_000)
      .select('id', F.expr('transform(sequence(0, 63), i -> cast(sin(id * 1.7 + i) as float))').alias('v'))
      .localCheckpoint())  # materialize so gen cost is excluded

PLANE = [((i * 2654435761) % 1000) / 1000.0 - 0.5 for i in range(64)]

def t(df_out, label, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        df_out.write.format('noop').mode('overwrite').save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f'{label:24s} {best:.3f}s')
    return best

# 1) HOF fold (current dot-against-literal-plane, one plane)
lit_arr = F.array(*[F.lit(p) for p in PLANE])
hof = F.aggregate(F.zip_with(F.col('v'), lit_arr, lambda x, y: x.cast('double') * y),
                  F.lit(0.0), lambda acc, x: acc + x)
t(df.select(hof.alias('d')), 'HOF fold x1 plane')

# 2) unrolled SQL expression, identical association order
terms = '0.0D'
for i, p in enumerate(PLANE):
    terms = f'({terms} + (CAST(v[{i}] AS DOUBLE) * {p!r}D))'
unr = F.expr(terms)
t(df.select(unr.alias('d')), 'unrolled x1 plane')

# 3) six planes each way (q28's shape)
import random
random.seed(7)
planes = [[((i * 2654435761 + j * 97) % 1000) / 1000.0 - 0.5 for i in range(64)] for j in range(6)]
b = F.lit(0).cast('long')
for j, pl in enumerate(planes):
    d = F.aggregate(F.zip_with(F.col('v'), F.array(*[F.lit(p) for p in pl]), lambda x, y: x.cast('double') * y),
                    F.lit(0.0), lambda acc, x: acc + x)
    b = b + F.when(d >= 0, F.lit(1 << j).cast('long')).otherwise(F.lit(0).cast('long'))
t(df.select(b.alias('bkt')), 'HOF bucket x6')

exprs = []
for j, pl in enumerate(planes):
    terms = '0.0D'
    for i, p in enumerate(pl):
        terms = f'({terms} + (CAST(v[{i}] AS DOUBLE) * {p!r}D))'
    exprs.append(f'(CASE WHEN {terms} >= 0 THEN {1 << j}L ELSE 0L END)')
bexpr = F.expr('CAST(0 AS BIGINT) + ' + ' + '.join(exprs))
t(df.select(bexpr.alias('bkt')), 'unrolled bucket x6')

# bit-identity check on both single-plane variants
n_diff = df.select(hof.alias('a'), unr.alias('b')).filter('a IS DISTINCT FROM b').count()
print('bit-diff rows (plane x1):', n_diff)
spark.stop()
