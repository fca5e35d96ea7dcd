from uig.cli.main import main

raise SystemExit(main())
