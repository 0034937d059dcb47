#!/usr/bin/env python3
"""Generate a deterministic eth-shaped fixture dir (seed=7) for the six
EthParity pipelines, with every malformed-row species the reference's
good_line predicates drop and overlapping scam addresses (which
duplicate joined rows — reference RDD-join semantics).

Usage:
  python3 tools/eth_smoke.py <dir>
  sbt "runMain graft.queries.EthParity all <dir>/in <dir>/out"
  python3 tools/eth_oracle.py <dir>/in <dir>/out
"""
import json, os, random, sys

def main(base, scale=1):
    random.seed(7)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir, exist_ok=True)
    ts = [1438905600, 1451606400, 1483228800]
    with open(f"{in_dir}/transactions.csv", "w") as f:
        f.write("hash,nonce,block_hash,block_number,transaction_index,"
                "from_address,to_address,value,gas,gas_price,input,"
                "block_timestamp,max_fee_per_gas,max_priority_fee_per_gas,"
                "transaction_type\n")
        for i in range(5000 * scale):
            to = f"0xc{i%40}" if i % 5 else f"plain{i%7}"
            f.write(f"h,0,bh,1,0,0xf,{to},{random.uniform(1,1e6):.2f},"
                    f"{21000+i%100},{50+i%20},0xin,{ts[i%3]},,,0\n")
        f.write("short,row\n")
    with open(f"{in_dir}/contracts.csv", "w") as f:
        for i in range(30):
            f.write(f"0xc{i},0xcode,sig,true,false,{i}\n")
    with open(f"{in_dir}/blocks.csv", "w") as f:
        for i in range(2000 * scale):
            hexv = "0x" + "a" * (40 + i % 8)
            miner = f"0xm{i%15}" if i % 11 else ""
            f.write(f"{i},bh,ph,n,{hexv},{hexv},{hexv},{hexv},{hexv},"
                    f"{miner},1,2,{1000+i},0xe,8000000,7900000,{ts[i%3]},10,0\n")
    scams = {"result": {str(k): {
        "id": k, "addresses": [f"0xc{k%40}", f"0xc{(k+1)%40}"],
        "status": "Active",
        "category": ["Phishing", "Scamming", "Fake ICO"][k % 3]}
        for k in range(12)}, "success": True}
    with open(f"{in_dir}/scams.json", "w") as f:
        f.write(json.dumps(scams))
    with open(f"{in_dir}/contractsTop10.csv", "w") as f:
        f.write(",Addresses,Value\n")
        for i in range(10):
            f.write(f"{i},0xc{i},123.0\n")
    print(f"fixtures written to {in_dir}")

if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)
