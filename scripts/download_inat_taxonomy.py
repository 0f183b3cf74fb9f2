#!/usr/bin/env python3
"""Fetch/build the iNat-2021 taxonomy mapping (class_id -> names).

Counterpart of reference scripts/download_inat_taxonomy.py. Network access
may be unavailable (this build environment has zero egress); in that case
``--synthesize N`` writes a placeholder taxonomy so the pipeline runs end to
end until real taxonomy data is provided.
"""
import argparse
import json
import sys
from pathlib import Path

TAXONOMY_URLS = (
    # iNat-2021 categories (train set metadata)
    "https://ml-inat-competition-datasets.s3.amazonaws.com/2021/categories.json.tar.gz",
)


def synthesize(n: int, out: Path) -> None:
    tax = {
        str(i): {
            "name": f"species_{i}",
            "common_name": f"Species {i}",
            "genus": f"genus_{i // 10}",
            "family": f"family_{i // 100}",
            "order": f"order_{i // 1000}",
            "class": ["Mammalia", "Aves", "Reptilia", "Amphibia",
                      "Insecta"][i % 5],
        }
        for i in range(n)
    }
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(tax))
    print(f"wrote synthetic taxonomy with {n} entries to {out}")


def download(out: Path) -> bool:
    import io
    import tarfile
    import urllib.request
    for url in TAXONOMY_URLS:
        try:
            print(f"fetching {url} ...")
            with urllib.request.urlopen(url, timeout=60) as resp:
                blob = resp.read()
        except OSError as e:
            print(f"  failed: {e}")
            continue
        try:
            with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
                for member in tar.getmembers():
                    if member.name.endswith("categories.json"):
                        cats = json.load(tar.extractfile(member))
                        break
                else:
                    continue
        except (tarfile.TarError, json.JSONDecodeError) as e:
            print(f"  parse failed: {e}")
            continue
        tax = {
            str(c.get("id", i)): {
                "name": c.get("name"),
                "common_name": c.get("common_name") or c.get("name"),
                "genus": c.get("genus"),
                "family": c.get("family"),
                "order": c.get("order"),
                "class": c.get("class"),
            }
            for i, c in enumerate(cats)
        }
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(tax))
        print(f"wrote {len(tax)} taxonomy entries to {out}")
        return True
    return False


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="models/inat2021_taxonomy.json")
    parser.add_argument("--synthesize", type=int, default=None,
                        help="write N synthetic entries instead of downloading")
    args = parser.parse_args()
    out = Path(args.out)
    if args.synthesize:
        synthesize(args.synthesize, out)
        return 0
    if not download(out):
        print("download failed (no network?); use --synthesize 10000 for a "
              "placeholder")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
