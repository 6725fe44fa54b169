from raquet_spark.cli import main

raise SystemExit(main())
