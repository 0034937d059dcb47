#!/usr/bin/env python3
"""Single-node throughput comparison baseline: the six reference jobs
re-implemented faithfully in the PySpark RDD style the reference uses
(textFile -> filter(good_line) -> map(split positional) -> reduceByKey
-> takeOrdered/collect, shared lineages recomputed per action, no
cache, no DataFrames) over a local fixture dir. Timings print as one
JSON line; compare with `runMain graft.queries.EthParity all` on the
same fixtures.

This is tooling for the perf comparison only — the engine itself is
the Scala library under src/.

Usage: rdd_reference_bench.py <inDir> [cores]
"""
import json, sys, time
from pyspark.sql import SparkSession


def main(in_dir, cores):
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.ui.enabled", "false").getOrCreate())
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    timings = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 2)

    tx_path = f"{in_dir}/transactions.csv"
    ct_path = f"{in_dir}/contracts.csv"
    bl_path = f"{in_dir}/blocks.csv"

    def neet_line(line):
        try:
            fields = line.split(',')
            if len(fields) != 15: return False
            float(fields[11]); float(fields[7])
            return True
        except Exception:
            return False

    def job_a():
        lines = sc.textFile(tx_path).filter(neet_line)
        monthly = lines.map(lambda l: (time.strftime(
            "%m-%Y", time.gmtime(float(l.split(',')[11]))), 1)) \
            .reduceByKey(lambda a, b: a + b)
        avg = lines.map(lambda l: (time.strftime(
            "%m-%Y", time.gmtime(float(l.split(',')[11]))),
            float(l.split(',')[7]))) \
            .reduceByKey(lambda a, b: a + b).join(monthly) \
            .map(lambda x: (x[0], x[1][0] / x[1][1]))
        monthly.collect(); avg.collect()  # two actions, shared scan recomputed

    def tx_line_b(line):
        try:
            f = line.split(',')
            return len(f) == 15 and f[6].startswith('0x') and float(f[7]) is not None
        except Exception:
            return False

    def job_b():
        t = sc.textFile(tx_path).filter(tx_line_b) \
            .map(lambda l: (l.split(',')[6], float(l.split(',')[7])))
        c = sc.textFile(ct_path) \
            .filter(lambda l: len(l.split(',')) == 6 and l.split(',')[0].startswith('0x')) \
            .map(lambda b: (b.split(',')[0], 1))
        c.join(t).map(lambda x: (x[0], x[1][1])) \
            .reduceByKey(lambda a, b: a + b) \
            .takeOrdered(10, key=lambda x: -x[1])

    def blk_line(line):
        try:
            f = line.split(',')
            return len(f) == 19 and float(f[12]) is not None
        except Exception:
            return False

    def job_c():
        sc.textFile(bl_path).filter(blk_line) \
            .map(lambda l: (l.split(',')[9], float(l.split(',')[12]))) \
            .reduceByKey(lambda a, b: a + b) \
            .takeOrdered(10, key=lambda x: -x[1])

    def job_d():
        scams = sc.textFile(f"{in_dir}/scams.json").map(json.loads) \
            .map(lambda x: x['result']) \
            .flatMap(lambda x: [(v['id'], (v['addresses'], v['status'], v['category']))
                                for k, v in x.items()]) \
            .flatMap(lambda x: [(a, (x[0], x[1][1], x[1][2])) for a in x[1][0]])
        txs = sc.textFile(tx_path).filter(neet_line) \
            .map(lambda x: (x.split(',')[6], (x.split(',')[7], x.split(',')[11])))
        joined = scams.join(txs)
        joined.map(lambda x: (x[1][0][0], float(x[1][1][0]))) \
            .reduceByKey(lambda a, b: a + b).takeOrdered(1, key=lambda x: -x[1])
        joined.map(lambda x: (x[1][0][2], float(x[1][1][0]))) \
            .reduceByKey(lambda a, b: a + b).takeOrdered(1, key=lambda x: -x[1])
        joined.map(lambda x: ((time.strftime("%m-%Y", time.gmtime(float(x[1][1][1]))),
                               x[1][0][2]), float(x[1][1][0]))) \
            .reduceByKey(lambda a, b: a + b).collect()

    def tx_line_e(line):
        try:
            f = line.split(',')
            return len(f) == 15 and float(f[9]) is not None and float(f[11]) is not None
        except Exception:
            return False

    def job_e():
        t = sc.textFile(tx_path).filter(tx_line_e)
        c = sc.textFile(ct_path).filter(lambda l: len(l.split(',')) == 6) \
            .map(lambda x: (x.split(',')[0], 1))
        top = sc.textFile(f"{in_dir}/contractsTop10.csv") \
            .map(lambda x: (x.split(',')[1], 1))
        t.map(lambda l: (time.strftime("%m/%Y", time.gmtime(float(l.split(',')[11]))),
                         (float(l.split(',')[9]), 1))) \
            .reduceByKey(lambda x, y: (x[0] + y[0], x[1] + y[1])) \
            .map(lambda a: (a[0], str(a[1][0] / a[1][1]))).take(100)
        t1 = t.map(lambda l: (l.split(',')[6],
                              (time.strftime("%m/%Y", time.gmtime(float(l.split(',')[11]))),
                               float(l.split(',')[8]))))
        joined = t1.join(c)
        joined.map(lambda x: (x[1][0][0], (x[1][0][1], x[1][1]))) \
            .reduceByKey(lambda x, y: (x[0] + y[0], x[1] + y[1])) \
            .map(lambda a: (a[0], str(a[1][0] / a[1][1]))) \
            .sortByKey(ascending=True).take(100)
        top.join(joined.map(lambda x: (x[0], (x[1][0][0], x[1][0][1], x[1][1])))) \
            .map(lambda x: (x[1][1][0], (x[1][1][1], x[1][1][2]))) \
            .reduceByKey(lambda a, b: (a[0] + b[0], a[1] + b[1])) \
            .map(lambda x: (x[0], x[1][0] / x[1][1])).collect()

    def ovh_line(line):
        try:
            f = line.split(',')
            if len(f) != 19 or f[9] == '': return False
            int(f[0]); float(f[12])
            return True
        except Exception:
            return False

    def job_f():
        sc.textFile(bl_path).filter(ovh_line) \
            .map(lambda x: (1, sum(len(x.split(',')[i]) - 2 for i in range(4, 9)) * 4)) \
            .reduceByKey(lambda a, b: a + b).collect()

    timed("transactionsAnalysis", job_a)
    timed("top10Contracts", job_b)
    timed("topMiners", job_c)
    timed("scams", job_d)
    timed("gasGuzzlers", job_e)
    timed("dataOverhead", job_f)
    timings["total"] = round(sum(timings.values()), 2)
    print(json.dumps({"engine": "pyspark-rdd-reference", "cores": cores,
                      "in": in_dir, "sec": timings}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 32)
