"""CIDR longest-prefix enrichment (operators/enrich.cidr_enrich) vs the
python ipaddress module."""

from __future__ import annotations

import ipaddress
import random

from super_speedy_syslog_searcher_spark.operators.enrich import cidr_enrich

CIDRS = [
    ("10.0.0.0/8", "corp"),
    ("10.1.0.0/16", "corp-east"),
    ("10.1.2.0/24", "corp-east-lab"),
    ("192.168.0.0/16", "home"),
    ("192.168.1.128/25", "home-iot"),
    ("0.0.0.0/0", "internet"),
]


def _ref(ip: str):
    a = ipaddress.ip_address(ip)
    best = None
    for cidr, name in CIDRS:
        net = ipaddress.ip_network(cidr, strict=False)
        if a in net and (best is None or net.prefixlen > best[1]):
            best = (cidr, net.prefixlen, name)
    return best


class TestCidrEnrich:
    def test_randomized_vs_ipaddress(self, spark):
        rng = random.Random(13)
        ips = ["10.1.2.7", "10.1.9.9", "10.9.9.9", "192.168.1.200", "192.168.1.5", "8.8.8.8"]
        ips += [
            f"{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}"
            for _ in range(120)
        ]
        fdf = spark.createDataFrame(list(enumerate(ips)), "fid long, ip string")
        ddf = spark.createDataFrame(CIDRS, "cidr string, zone string")
        got = {
            r["fid"]: (r["cidr"], r["prefix_len"], r["zone"])
            for r in cidr_enrich(fdf, ddf).collect()
        }
        for i, ip in enumerate(ips):
            assert got[i] == _ref(ip), ip

    def test_sloppy_network_and_duplicates_no_fanout(self, spark):
        fdf = spark.createDataFrame([(1, "10.1.200.9")], "fid long, ip string")
        # sloppy host bits + a duplicate block: canonicalized, deduped
        ddf = spark.createDataFrame(
            [("10.1.2.3/16", "a"), ("10.1.0.0/16", "b")], "cidr string, zone string"
        )
        rows = cidr_enrich(fdf, ddf).collect()
        assert len(rows) == 1 and rows[0]["prefix_len"] == 16

    def test_fact_side_never_shuffles(self, spark):
        fdf = spark.createDataFrame([(i, "10.0.0.1") for i in range(50)], "fid long, ip string")
        ddf = spark.createDataFrame(CIDRS, "cidr string, zone string")
        plan = cidr_enrich(fdf, ddf)._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
        assert plan.count("BroadcastHashJoin") >= 3
