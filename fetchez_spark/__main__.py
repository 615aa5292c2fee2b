from fetchez_spark.cli import main

raise SystemExit(main())
