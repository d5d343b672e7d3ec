from sparkt.cli import cli

cli()
