"""spark-submit driver shim.

    spark-submit --master <...> --py-files risjbot_spark.zip \
        tools/submit_driver.py crawl --pages ... --seeds ... --warehouse ...

spark-submit puts every --py-files artifact on the driver's and each
executor's sys.path, so the bare `import risjbot_spark` below resolves
from the zip — this file must NOT live inside the package (the package
arrives only via --py-files). All CLI arguments after the script path are
forwarded verbatim to the same `main()` that `python -m risjbot_spark`
uses. The session builder applies its defaults (shuffle partitions,
UTC session timezone, AQE) only for keys not already set externally, so
--master and --conf given to spark-submit win; the one exception is an
explicit `--partitions` app flag, which overrides the session conf for
shuffle partitions. A non-UTC session timezone is rejected by
CrawlEngine at startup (UTC is load-bearing for state semantics).
"""

from risjbot_spark.__main__ import main

if __name__ == "__main__":
    raise SystemExit(main())
