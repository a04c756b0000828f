"""Thin wrapper (r04): the independent struct-based media oracle moved
to graphscope_ray/oracle.py (media_pipeline_expected) so the
media_pipeline oracle_sql() twin regenerates its expectation at check
time — no committed artifact (r03 VERDICT #5). This tool remains only
for ad-hoc inspection of the expectation table.

Run from the repo root:  python tools/gen_media_oracle.py [out.parquet]
"""
import sys

sys.path.insert(0, ".")

N, SEED, OUT_W, OUT_H, FEAT_DIM = 96, 5, 8, 8, 8


def main():
    from graphscope_ray.data.multimodal import synth_media
    from graphscope_ray.oracle import media_pipeline_expected

    df = media_pipeline_expected(synth_media(n=N, seed=SEED),
                                 out_w=OUT_W, out_h=OUT_H,
                                 feat_dim=FEAT_DIM)
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/graphscope_ray_media_expected.parquet"
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows "
          f"({df['kind'].value_counts().to_dict()})")


if __name__ == "__main__":
    main()
