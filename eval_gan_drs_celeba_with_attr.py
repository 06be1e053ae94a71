"""CelebA attribute-sliced partial recall with DRS sampling
(reference eval_gan_drs_celeba_with_attr.py)."""
from eval_gan_celeba_with_attr import build_parser, run


def main():
    parser = build_parser()
    parser.add_argument("--use_original_netD", action="store_true")
    args = parser.parse_args()
    run(args, use_drs=True, use_original_netD=args.use_original_netD)


if __name__ == "__main__":
    main()
