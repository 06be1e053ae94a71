"""Index-sliced FID with DRS sampling (reference eval_gan_drs_with_index.py)."""
from eval_gan_with_index import build_parser, run


def main():
    parser = build_parser()
    parser.add_argument("--use_original_netD", action="store_true")
    args = parser.parse_args()
    run(args, use_drs=True, use_original_netD=args.use_original_netD)


if __name__ == "__main__":
    main()
