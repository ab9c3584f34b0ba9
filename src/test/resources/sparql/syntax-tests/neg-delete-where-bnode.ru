PREFIX : <http://x/>
DELETE WHERE { ?s :p _:b }
