"""CLI alias: ``python -m abwcf_ray.crawl --config crawl.toml ...``
(SURVEY.md §7 step 7). Delegates to pipelines.crawl.main."""

from abwcf_ray.pipelines.crawl import main

if __name__ == "__main__":
    main()
