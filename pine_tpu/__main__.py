from pine_tpu.cli import main

raise SystemExit(main())
