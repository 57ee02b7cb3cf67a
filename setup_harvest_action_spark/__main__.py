from setup_harvest_action_spark.cli import main

raise SystemExit(main())
